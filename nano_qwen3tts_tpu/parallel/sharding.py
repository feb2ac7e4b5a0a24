"""Tensor-parallel sharding rules for the model pytrees.

Implements the reference's TP plan (config.py:273-281: q/k/v colwise, o
rowwise, gate/up colwise, down rowwise — realized there as
Column/RowParallelLinear with explicit NCCL all_reduce,
layers/linear.py:54-153) as NamedSharding annotations; XLA GSPMD derives
the collectives.

Talker caveat (SURVEY §7): only 2 KV heads — when the model axis exceeds
the KV head count, K/V projections and the KV cache are *replicated* while
Q/O and the MLP stay sharded (GQA attention then shards over Q heads only).
The predictor's 8 KV heads shard normally.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def layer_stack_shardings(mesh: Mesh, num_kv_heads: int) -> dict:
    model = mesh.shape["model"]
    kv_shardable = num_kv_heads % model == 0
    kv = "model" if kv_shardable else None
    d = {
        "input_layernorm": _ns(mesh),
        "post_attention_layernorm": _ns(mesh),
        "q_w": _ns(mesh, None, None, "model"),
        "k_w": _ns(mesh, None, None, kv),
        "v_w": _ns(mesh, None, None, kv),
        "o_w": _ns(mesh, None, "model", None),
        "gate_w": _ns(mesh, None, None, "model"),
        "up_w": _ns(mesh, None, None, "model"),
        "down_w": _ns(mesh, None, "model", None),
        # optional leaves — harmless if absent
        "q_b": _ns(mesh, None, "model"),
        "k_b": _ns(mesh, None, kv),
        "v_b": _ns(mesh, None, kv),
        "q_norm": _ns(mesh),
        "k_norm": _ns(mesh),
        # fused variants (models/transformer.fuse_layer_stack): out-dim
        # sharding splits head boundaries only when the KV heads divide the
        # model axis; otherwise replicate the fused QKV (the talker's 2 KV
        # heads — unfused trees shard Q independently in that regime).
        "qkv_w": _ns(mesh, None, None, kv),
        "qkv_b": _ns(mesh, None, kv),
        "gateup_w": _ns(mesh, None, None, "model"),
    }
    return d


def talker_shardings(mesh: Mesh, cfg) -> dict:
    ls = layer_stack_shardings(mesh, cfg.num_key_value_heads)
    return {
        "layers": ls,
        "norm": _ns(mesh),
        # vocab 3072/4224 at hidden 1024: small — replicate, avoiding the
        # logits gather the reference needs (embed_head.py:63-65).
        "codec_embedding": _ns(mesh),
        "codec_head_w": _ns(mesh),
        # prompt-prep-only tables; shard the big text vocab over model to
        # split the 311MB table, gathers happen off the hot path.
        "text_embedding": _ns(mesh, "model", None),
        "text_projection": {
            "fc1_w": _ns(mesh, None, "model"),
            "fc1_b": _ns(mesh, "model"),
            "fc2_w": _ns(mesh, "model", None),
            "fc2_b": _ns(mesh),
        },
    }


def predictor_shardings(mesh: Mesh, cfg) -> dict:
    ls = layer_stack_shardings(mesh, cfg.num_key_value_heads)
    return {
        "layers": ls,
        "norm": _ns(mesh),
        "codec_embeddings": _ns(mesh),  # [15, 2048, D] — small, replicate
        "lm_heads": _ns(mesh, None, None, "model"),
        "proj_w": _ns(mesh),
        "proj_b": _ns(mesh),
    }


def kv_cache_sharding(mesh: Mesh, num_kv_heads: int) -> NamedSharding:
    model = mesh.shape["model"]
    kv = "model" if num_kv_heads % model == 0 else None
    # bf16 cache [layers, slots, kv_heads, head_dim]
    return _ns(mesh, None, None, kv, None)


def quantized_kv_sharding(mesh: Mesh, num_kv_heads: int):
    """Sharding pytree for an int8 ops.kv_cache.QuantizedKV.

    The value plane is FLAT [layers, slots, kv_heads*head_dim] (see
    QuantizedKV docstring); sharding the flat minor dim over "model" splits
    at head boundaries exactly like the fused k_w/v_w out-dim rule, so it
    stays consistent with the projection sharding. Per-slot scales are
    head-independent and replicate over "model"."""
    from nano_qwen3tts_tpu.ops.kv_cache import QuantizedKV

    model = mesh.shape["model"]
    kv = "model" if num_kv_heads % model == 0 else None
    return QuantizedKV(_ns(mesh, None, None, kv), _ns(mesh))


def data_sharded_kv_sharding(mesh: Mesh, num_kv_heads: int, quantized: bool):
    """Shardings for the data-sharded serving KV pools (leading [n_data]
    shard dim over "data"; kv-head dim still follows the model-axis rule so
    TP inside a shard stays consistent with the projection shardings)."""
    model = mesh.shape["model"]
    kv = "model" if num_kv_heads % model == 0 else None
    if quantized:
        from nano_qwen3tts_tpu.ops.kv_cache import QuantizedKV

        # q [n_data, L, S, Hkv*d], s [n_data, L, S]
        return QuantizedKV(_ns(mesh, "data", None, None, kv), _ns(mesh, "data"))
    # [n_data, L, S, Hkv, d]
    return _ns(mesh, "data", None, None, kv, None)


def quantized_weight_shardings(rule: NamedSharding, mesh: Mesh):
    """Derive (q, s) shardings for an ops.quant.QuantizedWeight from the
    bf16 weight's rule: ``q [.., K, N]`` keeps the rule's spec, ``s [.., N]``
    drops the contraction axis (so per-output-channel scales follow the
    out-dim sharding of their weight)."""
    spec = tuple(rule.spec)
    s_spec = P(*(spec[:-2] + spec[-1:])) if len(spec) >= 2 else P()
    return rule, NamedSharding(mesh, s_spec)


def apply_shardings(tree: dict, shardings: dict, mesh: Mesh):
    """device_put each leaf with its rule (missing rules -> replicated).

    Handles ops.quant.QuantizedWeight leaves: the bf16 rule written for the
    plain weight is split into (q, s) rules, so the same sharding tables
    serve bf16 and int8 engines."""
    from nano_qwen3tts_tpu.ops.quant import QuantizedWeight

    repl = NamedSharding(mesh, P())

    def rec(t, s):
        out = {}
        for k, v in t.items():
            rule = s.get(k) if isinstance(s, dict) else None
            if isinstance(v, dict):
                out[k] = rec(v, rule if isinstance(rule, dict) else {})
            elif isinstance(v, QuantizedWeight):
                if not isinstance(rule, NamedSharding):
                    rule = repl
                q_rule, s_rule = quantized_weight_shardings(rule, mesh)
                out[k] = QuantizedWeight(
                    jax.device_put(v.q, q_rule),
                    jax.device_put(v.s, s_rule),
                    v.mode,
                )
            else:
                if not isinstance(rule, NamedSharding):
                    rule = repl
                out[k] = jax.device_put(v, rule)
        return out

    return rec(tree, shardings)
