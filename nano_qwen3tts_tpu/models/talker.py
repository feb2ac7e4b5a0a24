"""Talker model: codec-token LLM (codebook 0) forward passes.

Pure-function equivalent of the reference Qwen3TTSTalkerForCausalLM
(models/qwen3_tts_talker.py:65-136): N pre-norm decoder layers + final norm,
codec LM head, and the text-projection MLP used by prompt prep. Forward
always consumes *input embeddings* (the talker never sees token ids).

Logits are computed from the last valid token only (the reference's
ParallelLMHead gathers last-token hiddens via cu_seqlens at prefill,
layers/embed_head.py:56-66) and the post-final-norm last hidden state is
returned alongside — it seeds the predictor's prefill
(interface.py:1243-1252).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nano_qwen3tts_tpu.models.transformer import (
    AttnSpec,
    linear,
    stack_decode_paged,
    stack_prefill,
)


def talker_spec(cfg) -> AttnSpec:
    return AttnSpec.from_model_config(cfg)


def text_projection(params: dict, x: jax.Array) -> jax.Array:
    """Text-embedding -> talker-dim MLP (Qwen3TTSTalkerResizeMLP,
    qwen3_tts_talker.py:22-31): fc2(silu(fc1(x)))."""
    tp = params["text_projection"]
    h = linear(x, tp["fc1_w"], tp["fc1_b"])
    return linear(jax.nn.silu(h), tp["fc2_w"], tp["fc2_b"])


def talker_prefill(
    params: dict,
    spec: AttnSpec,
    embeds: jax.Array,  # [B, T, D] right-padded prompt embeddings
    positions: jax.Array,  # [B, T] int32
    lengths: jax.Array,  # [B] int32 true prompt lengths
    slots: jax.Array,  # [B*T] int32 KV slots (garbage for pads)
    k_cache: jax.Array,
    v_cache: jax.Array,
):
    """Returns (logits [B, V], last_hidden [B, D], k_cache, v_cache)."""
    valid = (
        jnp.arange(embeds.shape[1], dtype=jnp.int32)[None, :] < lengths[:, None]
    )
    hidden, k_cache, v_cache = stack_prefill(
        params["layers"],
        params["norm"],
        embeds,
        positions,
        valid,
        slots,
        k_cache,
        v_cache,
        spec,
    )
    last_idx = jnp.maximum(lengths - 1, 0)
    last_hidden = jnp.take_along_axis(
        hidden, last_idx[:, None, None], axis=1
    )[:, 0]  # [B, D]
    logits = linear(last_hidden, params["codec_head_w"])
    return logits, last_hidden, k_cache, v_cache


def talker_decode(
    params: dict,
    spec: AttnSpec,
    embeds: jax.Array,  # [B, D] caller-fed frame embeddings
    positions: jax.Array,  # [B] int32 RoPE positions (kv_len + 1 — see
    # engine/sequence.py for the reference off-by-one)
    slots: jax.Array,  # [B] int32 KV write slots
    block_tables: jax.Array,  # [B, NB]
    kv_lens: jax.Array,  # [B] valid KV entries incl. this write
    k_cache: jax.Array,
    v_cache: jax.Array,
    block_size: int,
    attn_impl: str = "xla",
):
    """Returns (logits [B, V], hidden [B, D], k_cache, v_cache).

    attn_impl="burst" routes the whole 20-layer stack through ONE Pallas
    kernel (ops/talker_burst_pallas.py) — per-layer weights streamed into
    VMEM, attend-with-extension in-kernel — when the layout supports it
    (w8a8 fused weights, int8 KV, one cache block per lane); falls back to
    the XLA stack otherwise.
    """
    if attn_impl == "burst":
        from nano_qwen3tts_tpu.ops.talker_burst_pallas import (
            supports_talker_burst,
            talker_stack_burst,
        )

        B = embeds.shape[0]
        if supports_talker_burst(
            params, spec, k_cache, B, block_size,
            block_tables.shape[1] * block_size,
        ):
            # cache updated in place by the kernel (aliased value planes +
            # one scale scatter) — no XLA-visible cache read or DUS copy
            hidden, k_cache, v_cache = talker_stack_burst(
                params, spec, embeds, positions, block_tables, kv_lens,
                k_cache, v_cache, block_size,
            )
            logits = linear(hidden, params["codec_head_w"])
            return logits, hidden, k_cache, v_cache
        attn_impl = "xla"
    hidden, k_cache, v_cache = stack_decode_paged(
        params["layers"],
        params["norm"],
        embeds,
        positions,
        slots,
        block_tables,
        kv_lens,
        k_cache,
        v_cache,
        spec,
        block_size,
        attn_impl,
    )
    logits = linear(hidden, params["codec_head_w"])
    return logits, hidden, k_cache, v_cache
