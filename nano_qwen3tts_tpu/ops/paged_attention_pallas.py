"""Pallas paged decode attention kernel (TPU).

The hot kernel of the serving loop — replaces the XLA gather fallback
(ops/attention.paged_decode_attention_xla), which materializes each
sequence's whole KV window (an extra HBM round trip). This kernel DMAs KV
blocks from HBM into VMEM by block table (scalar-prefetched) and runs the
attention on-chip. TPU counterpart of the reference's
``flash_attn_with_kvcache`` paged decode (layers/attention.py:93-95).

Layout trick (required by Mosaic lane tiling): the KV cache's
``(kv_heads, head_dim)`` minor dims are *folded* into one lane dimension
``F = Hkv*d`` (128-aligned for the talker's 2x64 heads), so every DMA slice
is full-lane-width. GQA head selection then needs no sub-128 lane slicing:

  * queries are pre-placed into per-head lane blocks (``q_folded[b, hq]`` is
    zero except in its KV head's d-slice), so ONE [Hq, F] x [F, W] matmul
    yields exactly the right GQA logits (zeros annihilate cross-head terms);
  * the kernel's [Hq, W] x [W, F] PV matmul returns [Hq, F]; the caller
    gathers each query head's own d-block afterwards (cheap XLA gather).

Cost of the fold: Hkv-fold more MACs on tiny matmuls — noise next to the KV
DMA traffic that dominates decode attention.

Grid = (B,), one program per sequence lane; per program 2*NB async block
DMAs (K and V) launched together then awaited, masked softmax over kv_len.
Correctness is pinned to the XLA fallback in tests (interpret mode on CPU,
compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _decode_kernel(
    bt_ref,  # scalar prefetch: [B*NB] int32 flat block tables
    len_ref,  # scalar prefetch: [B] int32 kv lens
    q_ref,  # [1, Hq, F] VMEM — lane-folded, zero-padded per-head queries
    k_hbm,  # [S, F] ANY/HBM — lane-folded cache
    v_hbm,  # [S, F]
    o_ref,  # [1, Hq, F] VMEM
    k_vmem,  # [W, F] scratch
    v_vmem,
    sems,  # [2, NB] DMA semaphores
    *,
    NB: int,
    bs: int,
    scale: float,
):
    b = pl.program_id(0)
    # Launch all block DMAs, then wait. Garbage blocks (padded table entries
    # = block 0) are copied too and masked out of the softmax.
    for i in range(NB):
        blk = bt_ref[b * NB + i]
        start = pl.multiple_of(blk * bs, bs)
        pltpu.make_async_copy(
            k_hbm.at[pl.ds(start, bs)], k_vmem.at[pl.ds(i * bs, bs)], sems.at[0, i]
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[pl.ds(start, bs)], v_vmem.at[pl.ds(i * bs, bs)], sems.at[1, i]
        ).start()
    for i in range(NB):
        pltpu.make_async_copy(
            k_hbm.at[pl.ds(0, bs)], k_vmem.at[pl.ds(i * bs, bs)], sems.at[0, i]
        ).wait()
        pltpu.make_async_copy(
            v_hbm.at[pl.ds(0, bs)], v_vmem.at[pl.ds(i * bs, bs)], sems.at[1, i]
        ).wait()

    n = len_ref[b]
    q = q_ref[0]  # [Hq, F]
    logits = (
        jax.lax.dot_general(
            q, k_vmem[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # [Hq, W]
    valid = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) < n
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v_vmem.dtype), v_vmem[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Hq, F]
    o_ref[0] = out.astype(o_ref.dtype)


def paged_decode_attention_pallas(
    q: jax.Array,  # [B, Hq, d]
    k_cache_l: jax.Array,  # [S, Hkv, d]
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [B, NB]
    kv_lens: jax.Array,  # [B]
    block_size: int,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, d = q.shape
    S, Hkv, _ = k_cache_l.shape
    F = Hkv * d
    group = Hq // Hkv
    NB = block_tables.shape[1]
    W = NB * block_size

    kf = k_cache_l.reshape(S, F)  # bitcast-free fold (row-major)
    vf = v_cache_l.reshape(S, F)
    head_of = jnp.arange(Hq) // group  # [Hq] kv head of each q head
    q_folded = (
        jnp.zeros((B, Hq, Hkv, d), q.dtype)
        .at[:, jnp.arange(Hq), head_of]
        .set(q)
        .reshape(B, Hq, F)
    )

    kernel = functools.partial(_decode_kernel, NB=NB, bs=block_size, scale=scale)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hq, F), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hq, F), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, F), k_cache_l.dtype),
            pltpu.VMEM((W, F), v_cache_l.dtype),
            pltpu.SemaphoreType.DMA((2, NB)),
        ],
    )
    out_folded = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, F), q.dtype),
        interpret=interpret,
    )(block_tables.reshape(-1), kv_lens, q_folded, kf, vf)
    # pick each query head's own d-block from the folded PV result
    out = out_folded.reshape(B, Hq, Hkv, d)[:, jnp.arange(Hq), head_of]
    return out
