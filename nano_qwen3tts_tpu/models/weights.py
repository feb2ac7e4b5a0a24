"""Weight creation and checkpoint loading.

Loads the reference checkpoint format (single ``model.safetensors`` with
``talker.*`` / ``talker.code_predictor.*`` keys — see reference
models/qwen3_tts_talker.py:81-113 and qwen3_tts_predictor.py:63-85 for the
key remap semantics) into stacked JAX pytrees:

* torch ``nn.Linear`` weights ``[out, in]`` are transposed to ``[in, out]``
  so forward is ``x @ w``;
* per-layer tensors are stacked along a leading layer axis (lax.scan);
* the predictor's 15 per-codebook embedding tables and LM heads are stacked
  into ``[15, V, D]`` / ``[15, D, V]`` so codebook-step selection is a
  ``dynamic_index`` inside one jitted scan instead of 15 Python modules.

``init_*_params`` build randomly-initialized pytrees of the same structure
(used by tests and benches; there is no public checkpoint in this
environment).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nano_qwen3tts_tpu.config import CodePredictorConfig, TalkerConfig

_HOST_INIT = [False]


class host_random_init:
    """Context manager: generate random init on the host (numpy) and
    transfer once, instead of compiling one XLA program per tensor — on a
    remote-compile TPU backend each tiny init op costs seconds."""

    def __enter__(self):
        _HOST_INIT[0] = True

    def __exit__(self, *a):
        _HOST_INIT[0] = False


_np_seed = [0]


def _randn(key, shape, _dtype=jnp.float32):
    if _HOST_INIT[0]:
        _np_seed[0] += 1
        r = np.random.default_rng(_np_seed[0])
        return jnp.asarray(r.standard_normal(shape, dtype=np.float32))
    return jax.random.normal(key, shape, _dtype)


# ---------------------------------------------------------------------------
# Random init
# ---------------------------------------------------------------------------


def _init_layer_stack(
    key,
    num_layers: int,
    hidden: int,
    intermediate: int,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    qkv_bias: bool,
    dtype,
) -> dict:
    ks = jax.random.split(key, 8)
    s = 0.02
    D, I, Hq, Hkv, d = hidden, intermediate, num_heads, num_kv_heads, head_dim

    def w(k, shape):
        return (_randn(k, (num_layers, *shape)) * s).astype(dtype)

    layers = {
        "input_layernorm": jnp.ones((num_layers, D), dtype),
        "post_attention_layernorm": jnp.ones((num_layers, D), dtype),
        "q_w": w(ks[0], (D, Hq * d)),
        "k_w": w(ks[1], (D, Hkv * d)),
        "v_w": w(ks[2], (D, Hkv * d)),
        "o_w": w(ks[3], (Hq * d, D)),
        "gate_w": w(ks[4], (D, I)),
        "up_w": w(ks[5], (D, I)),
        "down_w": w(ks[6], (I, D)),
    }
    if qkv_bias:
        layers["q_b"] = jnp.zeros((num_layers, Hq * d), dtype)
        layers["k_b"] = jnp.zeros((num_layers, Hkv * d), dtype)
        layers["v_b"] = jnp.zeros((num_layers, Hkv * d), dtype)
    else:
        layers["q_norm"] = jnp.ones((num_layers, d), dtype)
        layers["k_norm"] = jnp.ones((num_layers, d), dtype)
    return layers


def init_talker_params(
    cfg: TalkerConfig, key, dtype=jnp.bfloat16, include_text: bool = True
) -> dict:
    """``include_text=False`` skips the (large) text-embedding table and
    text projection — the serving frame loop never touches them (prompt prep
    is host-side), and skipping them keeps a fully-jitted init program
    small (bench.py builds weights on device in ONE jitted call)."""
    k0, k1, k2, k3, k4, k5 = jax.random.split(key, 6)
    D = cfg.hidden_size
    d = cfg.actual_head_dim
    s = 0.02
    params = {
        "layers": _init_layer_stack(
            k0,
            cfg.num_hidden_layers,
            D,
            cfg.intermediate_size,
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            d,
            cfg.attention_bias,
            dtype,
        ),
        "norm": jnp.ones((D,), dtype),
        "codec_embedding": (
            _randn(k1, (cfg.vocab_size, D)) * s
        ).astype(dtype),
        "codec_head_w": (
            _randn(k3, (D, cfg.vocab_size)) * s
        ).astype(dtype),
    }
    if include_text:
        params["text_embedding"] = (
            _randn(k2, (cfg.text_vocab_size, cfg.text_hidden_size)) * s
        ).astype(dtype)
        params["text_projection"] = {
            "fc1_w": (
                _randn(k4, (cfg.text_hidden_size, cfg.text_hidden_size))
                * s
            ).astype(dtype),
            "fc1_b": jnp.zeros((cfg.text_hidden_size,), dtype),
            "fc2_w": (
                _randn(k5, (cfg.text_hidden_size, D)) * s
            ).astype(dtype),
            "fc2_b": jnp.zeros((D,), dtype),
        }
    return params


def init_predictor_params(cfg: CodePredictorConfig, key, dtype=jnp.bfloat16) -> dict:
    k0, k1, k2, k3 = jax.random.split(key, 4)
    Dp, Dt = cfg.hidden_size, cfg.talker_hidden_size
    n_cb = cfg.num_code_groups - 1
    s = 0.02
    params = {
        "layers": _init_layer_stack(
            k0,
            cfg.num_hidden_layers,
            Dp,
            cfg.intermediate_size,
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.head_dim,
            cfg.attention_bias,
            dtype,
        ),
        "norm": jnp.ones((Dp,), dtype),
        # [15, V, D_talker] — tables live at talker dim (qwen3_tts_predictor.py:22-28)
        "codec_embeddings": (
            _randn(k1, (n_cb, cfg.vocab_size, Dt)) * s
        ).astype(dtype),
        # [15, Dp, V]
        "lm_heads": (
            _randn(k2, (n_cb, Dp, cfg.vocab_size)) * s
        ).astype(dtype),
    }
    if Dp != Dt:  # small_to_mtp_projection (qwen3_tts_predictor.py:58-61)
        params["proj_w"] = (
            _randn(k3, (Dt, Dp)) * s
        ).astype(dtype)
        params["proj_b"] = jnp.zeros((Dp,), dtype)
    return params


# ---------------------------------------------------------------------------
# Checkpoint loading (safetensors, reference key layout)
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    a = np.asarray(t)
    if a.dtype == np.dtype("V2"):  # raw bf16 from safetensors numpy
        import jax.numpy as _jnp

        a = np.asarray(_jnp.asarray(t))
    return a


def _stack_layers(
    sd: dict, prefix: str, num_layers: int, qkv_bias: bool, dtype
) -> dict:
    def get(i, name, transpose=False):
        t = _np(sd[f"{prefix}.layers.{i}.{name}"]).astype(np.float32)
        return t.T if transpose else t

    names_t = {
        "q_w": "self_attn.q_proj.weight",
        "k_w": "self_attn.k_proj.weight",
        "v_w": "self_attn.v_proj.weight",
        "o_w": "self_attn.o_proj.weight",
        "gate_w": "mlp.gate_proj.weight",
        "up_w": "mlp.up_proj.weight",
        "down_w": "mlp.down_proj.weight",
    }
    out = {}
    for key, name in names_t.items():
        out[key] = jnp.asarray(
            np.stack([get(i, name, transpose=True) for i in range(num_layers)]), dtype
        )
    for key, name in {
        "input_layernorm": "input_layernorm.weight",
        "post_attention_layernorm": "post_attention_layernorm.weight",
    }.items():
        out[key] = jnp.asarray(
            np.stack([get(i, name) for i in range(num_layers)]), dtype
        )
    if qkv_bias:
        for key, name in {
            "q_b": "self_attn.q_proj.bias",
            "k_b": "self_attn.k_proj.bias",
            "v_b": "self_attn.v_proj.bias",
        }.items():
            out[key] = jnp.asarray(
                np.stack([get(i, name) for i in range(num_layers)]), dtype
            )
    else:
        for key, name in {
            "q_norm": "self_attn.q_norm.weight",
            "k_norm": "self_attn.k_norm.weight",
        }.items():
            out[key] = jnp.asarray(
                np.stack([get(i, name) for i in range(num_layers)]), dtype
            )
    return out


def load_checkpoint(model_path: str) -> dict:
    """Load ``model.safetensors`` into a flat {torch_key: np.ndarray} dict."""
    import os

    from safetensors import safe_open

    sd = {}
    path = os.path.join(model_path, "model.safetensors")
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            try:
                sd[k] = f.get_tensor(k)
            except (TypeError, ValueError):
                # bf16 tensors: numpy has no bf16; reread via jax
                pass
    missing = []
    with safe_open(path, framework="np") as f:
        keys = list(f.keys())
    if len(sd) != len(keys):
        import torch  # torch-cpu is in the image; only used for bf16 decode

        from safetensors.torch import load_file

        tsd = load_file(path)
        for k in keys:
            if k not in sd:
                sd[k] = tsd[k].to(torch.float32).numpy()
    return sd


def talker_params_from_state_dict(
    sd: dict, cfg: TalkerConfig, dtype=jnp.bfloat16
) -> dict:
    """Remap reference talker keys (strip ``talker.``, skip code_predictor /
    speaker_encoder — qwen3_tts_talker.py:81-113) into the stacked pytree."""
    t = {
        k[len("talker.") :]: v
        for k, v in sd.items()
        if k.startswith("talker.") and not k.startswith("talker.code_predictor.")
    }
    if "model.codec_embedding.weight" not in t and "model.embed_tokens.weight" in t:
        t["model.codec_embedding.weight"] = t["model.embed_tokens.weight"]

    def arr(key, transpose=False):
        a = _np(t[key]).astype(np.float32)
        return jnp.asarray(a.T if transpose else a, dtype)

    return {
        "layers": _stack_layers(
            t, "model", cfg.num_hidden_layers, cfg.attention_bias, dtype
        ),
        "norm": arr("model.norm.weight"),
        "codec_embedding": arr("model.codec_embedding.weight"),
        "text_embedding": arr("model.text_embedding.weight"),
        "codec_head_w": arr("codec_head.weight", transpose=True),
        "text_projection": {
            "fc1_w": arr("text_projection.linear_fc1.weight", transpose=True),
            "fc1_b": arr("text_projection.linear_fc1.bias"),
            "fc2_w": arr("text_projection.linear_fc2.weight", transpose=True),
            "fc2_b": arr("text_projection.linear_fc2.bias"),
        },
    }


def predictor_params_from_state_dict(
    sd: dict, cfg: CodePredictorConfig, dtype=jnp.bfloat16
) -> dict:
    """Remap ``talker.code_predictor.*`` keys (qwen3_tts_predictor.py:63-85)."""
    p = {
        k[len("talker.code_predictor.") :]: v
        for k, v in sd.items()
        if k.startswith("talker.code_predictor.")
    }

    def arr(key, transpose=False):
        a = _np(p[key]).astype(np.float32)
        return jnp.asarray(a.T if transpose else a, dtype)

    n_cb = cfg.num_code_groups - 1
    params = {
        "layers": _stack_layers(
            p, "model", cfg.num_hidden_layers, cfg.attention_bias, dtype
        ),
        "norm": arr("model.norm.weight"),
        "codec_embeddings": jnp.stack(
            [arr(f"model.codec_embedding.{i}.weight") for i in range(n_cb)]
        ),
        "lm_heads": jnp.stack(
            [arr(f"lm_head.{i}.weight", transpose=True) for i in range(n_cb)]
        ),
    }
    if "small_to_mtp_projection.weight" in p:
        params["proj_w"] = arr("small_to_mtp_projection.weight", transpose=True)
        params["proj_b"] = arr("small_to_mtp_projection.bias")
    return params


def load_models(model_path: str, cfg, dtype=jnp.bfloat16) -> tuple[dict, dict]:
    """Load talker + predictor pytrees from a checkpoint directory."""
    sd = load_checkpoint(model_path)
    tp = talker_params_from_state_dict(sd, cfg.talker_config, dtype)
    pp = predictor_params_from_state_dict(
        sd, cfg.talker_config.code_predictor_config, dtype
    )
    return tp, pp
