"""Attention primitives: dense batched prefill + paged decode.

TPU-native replacement for the reference's FlashAttention-2 kernels
(layers/attention.py:88-95 — ``flash_attn_varlen_func`` for ragged prefill,
``flash_attn_with_kvcache`` for paged decode):

* Prefill runs as a *dense padded batch* ``[B, T, ...]`` with a causal+valid
  mask. Each (B, T) bucket compiles once; XLA fuses QK^T -> softmax -> PV
  into an MXU-friendly pipeline. This trades pad FLOPs for zero ragged
  bookkeeping — the right trade on TPU where prefill is a tiny fraction of a
  TTS stream's lifetime (one prefill vs hundreds of decode frames).
* Decode reads the paged KV cache. Two interchangeable implementations:
  an XLA gather fallback (always correct, materializes the KV window) and a
  Pallas kernel (ops/paged_attention_pallas.py) that reads KV blocks from
  HBM by block table without materialization.

All accumulation is float32 (matching flash-attn's f32 accumulators);
inputs/outputs are bfloat16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[..., Hkv, d] -> [..., Hkv*n_rep, d] (GQA head expansion)."""
    if n_rep == 1:
        return x
    return jnp.repeat(x, n_rep, axis=-2)


def dense_prefill_attention(
    q: jax.Array,  # [B, T, Hq, d]
    k: jax.Array,  # [B, T, Hkv, d]
    v: jax.Array,  # [B, T, Hkv, d]
    valid: jax.Array,  # [B, T] bool — True for real tokens
    scale: float,
) -> jax.Array:
    """Causal self-attention over a right-padded batch. Returns [B, T, Hq, d]."""
    B, T, Hq, d = q.shape
    n_rep = Hq // k.shape[2]
    k = _repeat_kv(k, n_rep)
    v = _repeat_kv(v, n_rep)
    logits = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    ) * scale
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))
    mask = causal[None, None, :, :] & valid[:, None, None, :]
    logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhts,bshd->bthd", probs, v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def paged_decode_attention_xla(
    q: jax.Array,  # [B, Hq, d] — one query token per sequence
    k_cache_l: jax.Array,  # [S, Hkv, d] one layer's flat-slot cache
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [B, NB] int32 (garbage-block padded)
    kv_lens: jax.Array,  # [B] int32 — valid KV entries (incl. this step's write)
    block_size: int,
    scale: float,
) -> jax.Array:
    """Paged decode attention, XLA gather fallback. Returns [B, Hq, d].

    The current step's K/V must already be written to the cache (the fused
    step writes KV before attending, mirroring the reference order:
    store_kvcache then flash_attn_with_kvcache, layers/attention.py:84-95).
    """
    from nano_qwen3tts_tpu.ops.kv_cache import gather_kv

    B, Hq, d = q.shape
    k_win, v_win = gather_kv(k_cache_l, v_cache_l, block_tables, block_size)
    # [B, W, Hkv, d]
    W = k_win.shape[1]
    n_rep = Hq // k_win.shape[2]
    k_win = _repeat_kv(k_win, n_rep)
    v_win = _repeat_kv(v_win, n_rep)
    logits = jnp.einsum(
        "bhd,bshd->bhs", q, k_win, preferred_element_type=jnp.float32
    ) * scale
    mask = jnp.arange(W, dtype=jnp.int32)[None, :] < kv_lens[:, None]
    logits = jnp.where(mask[:, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhs,bshd->bhd", probs, v_win, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def dense_decode_attention(
    q: jax.Array,  # [B, Hq, d]
    k_ctx: jax.Array,  # [B, W, Hkv, d] contiguous context (e.g. predictor scan KV)
    v_ctx: jax.Array,
    kv_lens: jax.Array,  # [B] int32
    scale: float,
) -> jax.Array:
    """Decode attention over a dense per-sequence KV window. [B, Hq, d]."""
    B, Hq, d = q.shape
    W = k_ctx.shape[1]
    n_rep = Hq // k_ctx.shape[2]
    k_ctx = _repeat_kv(k_ctx, n_rep)
    v_ctx = _repeat_kv(v_ctx, n_rep)
    logits = jnp.einsum(
        "bhd,bshd->bhs", q, k_ctx, preferred_element_type=jnp.float32
    ) * scale
    mask = jnp.arange(W, dtype=jnp.int32)[None, :] < kv_lens[:, None]
    logits = jnp.where(mask[:, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhs,bshd->bhd", probs, v_ctx, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def paged_decode_attention(
    q, k_cache_l, v_cache_l, block_tables, kv_lens, block_size, scale,
    impl: str = "xla",
):
    """Dispatch between the XLA gather fallback and the Pallas kernel."""
    if impl == "pallas":
        from nano_qwen3tts_tpu.ops.paged_attention_pallas import (
            paged_decode_attention_pallas,
        )

        return paged_decode_attention_pallas(
            q, k_cache_l, v_cache_l, block_tables, kv_lens, block_size, scale
        )
    return paged_decode_attention_xla(
        q, k_cache_l, v_cache_l, block_tables, kv_lens, block_size, scale
    )
