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
    n = len_ref[b]
    n_blk = (n + bs - 1) // bs  # only DMA blocks that hold live KV
    # Launch the live block DMAs, then wait under the same predicates.
    for i in range(NB):
        @pl.when(i < n_blk)
        def _(i=i):
            blk = bt_ref[b * NB + i]
            start = pl.multiple_of(blk * bs, bs)
            pltpu.make_async_copy(
                k_hbm.at[pl.ds(start, bs)], k_vmem.at[pl.ds(i * bs, bs)],
                sems.at[0, i],
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(start, bs)], v_vmem.at[pl.ds(i * bs, bs)],
                sems.at[1, i],
            ).start()

        @pl.when(i >= n_blk)
        def _(i=i):
            # stale VMEM beyond kv_len: zero V so 0-probability rows cannot
            # inject NaNs into the PV matmul (K is softmax-masked anyway)
            v_vmem[pl.ds(i * bs, bs)] = jnp.zeros_like(v_vmem[pl.ds(i * bs, bs)])

    for i in range(NB):
        @pl.when(i < n_blk)
        def _(i=i):
            pltpu.make_async_copy(
                k_hbm.at[pl.ds(0, bs)], k_vmem.at[pl.ds(i * bs, bs)], sems.at[0, i]
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[pl.ds(0, bs)], v_vmem.at[pl.ds(i * bs, bs)], sems.at[1, i]
            ).wait()
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


# ---------------------------------------------------------------------------
# Stacked-cache variant: the kernel indexes the [L, S, F] cache by a
# scalar-prefetched layer id, so the layer scan never slices the cache in
# XLA (a per-layer slice materializes a 16MB copy per layer — measured 3x
# the kernel's own cost).
# ---------------------------------------------------------------------------


def _decode_kernel_stacked(
    layer_ref,  # scalar prefetch: [1] int32 layer id
    bt_ref,  # scalar prefetch: [B*NB]
    len_ref,  # scalar prefetch: [B]
    q_ref,  # [1, Hq, F]
    k_hbm,  # [L, S, F] full stacked cache (ANY)
    v_hbm,
    o_ref,  # [1, Hq, F]
    k_vmem,
    v_vmem,
    sems,
    *,
    NB: int,
    bs: int,
    scale: float,
):
    b = pl.program_id(0)
    l = layer_ref[0]
    n = len_ref[b]
    n_blk = (n + bs - 1) // bs
    for i in range(NB):
        @pl.when(i < n_blk)
        def _(i=i):
            blk = bt_ref[b * NB + i]
            start = pl.multiple_of(blk * bs, bs)
            pltpu.make_async_copy(
                k_hbm.at[l, pl.ds(start, bs)], k_vmem.at[pl.ds(i * bs, bs)],
                sems.at[0, i],
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[l, pl.ds(start, bs)], v_vmem.at[pl.ds(i * bs, bs)],
                sems.at[1, i],
            ).start()

        @pl.when(i >= n_blk)
        def _(i=i):
            v_vmem[pl.ds(i * bs, bs)] = jnp.zeros_like(v_vmem[pl.ds(i * bs, bs)])

    for i in range(NB):
        @pl.when(i < n_blk)
        def _(i=i):
            pltpu.make_async_copy(
                k_hbm.at[l, pl.ds(0, bs)], k_vmem.at[pl.ds(i * bs, bs)],
                sems.at[0, i],
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[l, pl.ds(0, bs)], v_vmem.at[pl.ds(i * bs, bs)],
                sems.at[1, i],
            ).wait()

    q = q_ref[0]
    logits = (
        jax.lax.dot_general(
            q, k_vmem[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    valid = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) < n
    logits = jnp.where(valid, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v_vmem.dtype), v_vmem[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = out.astype(o_ref.dtype)


def paged_decode_attention_pallas_stacked(
    q: jax.Array,  # [B, Hq, d]
    k_cache: jax.Array,  # [L, S, Hkv, d] FULL stacked cache
    v_cache: jax.Array,
    layer: jax.Array,  # scalar int32 layer id
    block_tables: jax.Array,  # [B, NB]
    kv_lens: jax.Array,  # [B]
    block_size: int,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, d = q.shape
    L, S, Hkv, _ = k_cache.shape
    F = Hkv * d
    group = Hq // Hkv
    NB = block_tables.shape[1]
    W = NB * block_size

    kf = k_cache.reshape(L, S, F)
    vf = v_cache.reshape(L, S, F)
    head_of = jnp.arange(Hq) // group
    q_folded = (
        jnp.zeros((B, Hq, Hkv, d), q.dtype)
        .at[:, jnp.arange(Hq), head_of]
        .set(q)
        .reshape(B, Hq, F)
    )
    kernel = functools.partial(
        _decode_kernel_stacked, NB=NB, bs=block_size, scale=scale
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hq, F), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hq, F), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, F), k_cache.dtype),
            pltpu.VMEM((W, F), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, NB)),
        ],
    )
    out_folded = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, F), q.dtype),
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        block_tables.reshape(-1),
        kv_lens,
        q_folded,
        kf,
        vf,
    )
    return out_folded.reshape(B, Hq, Hkv, d)[:, jnp.arange(Hq), head_of]


# ---------------------------------------------------------------------------
# Attend-with-extension variant (the production decode path).
#
# Mosaic cannot DMA single bf16 rows into HBM (sublane tiling), and XLA-side
# per-layer cache writes force either sliced-scan copies or carry-scatter
# copies. So the decode step never writes KV inside the layer loop at all:
# the kernel attends over the EXISTING cache (kv_lens entries) plus the
# current token's K/V passed in VMEM (every token attends to itself), and
# the caller batches all layers' new rows into a handful of
# dynamic-update-slices after the scan. The cache is then a loop-invariant
# operand of the layer scan — no slicing, no copies.
#
# Current-token math with folded lanes: q_folded . k_new_folded sums only
# the lane block where q is nonzero (its own KV head); the PV contribution
# p_new * v_new_folded fills every head block, and the caller's own-block
# gather keeps the right one.
# ---------------------------------------------------------------------------


def _decode_kernel_extend(
    layer_ref,  # [1] int32
    bt_ref,  # [B*NB]
    len_ref,  # [B] int32 — EXISTING entries (current token excluded)
    q_ref,  # [1, Hq, F]
    kn_ref,  # [1, 1, F] current token K (folded)
    vn_ref,  # [1, 1, F]
    k_hbm,  # [L, S, F]
    v_hbm,
    o_ref,  # [1, Hq, F]
    k_vmem,
    v_vmem,
    sems,
    *,
    NB: int,
    bs: int,
    scale: float,
):
    b = pl.program_id(0)
    l = layer_ref[0]
    n = len_ref[b]
    n_blk = (n + bs - 1) // bs
    for i in range(NB):
        @pl.when(i < n_blk)
        def _(i=i):
            blk = bt_ref[b * NB + i]
            start = pl.multiple_of(blk * bs, bs)
            pltpu.make_async_copy(
                k_hbm.at[l, pl.ds(start, bs)], k_vmem.at[pl.ds(i * bs, bs)],
                sems.at[0, i],
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[l, pl.ds(start, bs)], v_vmem.at[pl.ds(i * bs, bs)],
                sems.at[1, i],
            ).start()

        @pl.when(i >= n_blk)
        def _(i=i):
            v_vmem[pl.ds(i * bs, bs)] = jnp.zeros_like(v_vmem[pl.ds(i * bs, bs)])

    for i in range(NB):
        @pl.when(i < n_blk)
        def _(i=i):
            pltpu.make_async_copy(
                k_hbm.at[l, pl.ds(0, bs)], k_vmem.at[pl.ds(i * bs, bs)],
                sems.at[0, i],
            ).wait()
            pltpu.make_async_copy(
                v_hbm.at[l, pl.ds(0, bs)], v_vmem.at[pl.ds(i * bs, bs)],
                sems.at[1, i],
            ).wait()

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
    # current token: q . k_new (own-head block only, cross blocks are zero)
    logit_new = (
        jnp.sum(q * kn_ref[0], axis=-1, keepdims=True).astype(jnp.float32) * scale
    )  # [Hq, 1]
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), logit_new)
    p = jnp.exp(logits - m)
    p_new = jnp.exp(logit_new - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + p_new
    out = jax.lax.dot_general(
        (p / denom).astype(v_vmem.dtype), v_vmem[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + (p_new / denom) * vn_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def paged_decode_attention_extend(
    q: jax.Array,  # [B, Hq, d]
    k_new: jax.Array,  # [B, Hkv, d] current token K (not yet in the cache)
    v_new: jax.Array,
    k_cache: jax.Array,  # [L, S, Hkv, d] stacked cache (loop-invariant)
    v_cache: jax.Array,
    layer: jax.Array,  # scalar int32
    block_tables: jax.Array,  # [B, NB]
    kv_lens_existing: jax.Array,  # [B] — entries already in the cache
    block_size: int,
    scale: float,
    interpret: bool = False,
) -> jax.Array:
    B, Hq, d = q.shape
    L, S, Hkv, _ = k_cache.shape
    F = Hkv * d
    group = Hq // Hkv
    NB = block_tables.shape[1]
    W = NB * block_size

    kf = k_cache.reshape(L, S, F)
    vf = v_cache.reshape(L, S, F)
    head_of = jnp.arange(Hq) // group
    q_folded = (
        jnp.zeros((B, Hq, Hkv, d), q.dtype)
        .at[:, jnp.arange(Hq), head_of]
        .set(q)
        .reshape(B, Hq, F)
    )
    knf = k_new.reshape(B, 1, F)
    vnf = v_new.reshape(B, 1, F)
    kernel = functools.partial(
        _decode_kernel_extend, NB=NB, bs=block_size, scale=scale
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hq, F), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hq, F), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, F), k_cache.dtype),
            pltpu.VMEM((W, F), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, NB)),
        ],
    )
    out_folded = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, F), q.dtype),
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        block_tables.reshape(-1),
        kv_lens_existing,
        q_folded,
        knf,
        vnf,
        kf,
        vf,
    )
    return out_folded.reshape(B, Hq, Hkv, d)[:, jnp.arange(Hq), head_of]


def paged_decode_attention_extend_xla(
    q, k_new, v_new, k_cache, v_cache, layer, block_tables,
    kv_lens_existing, block_size, scale,
):
    """XLA fallback with identical semantics (CPU tests / non-TPU)."""
    from nano_qwen3tts_tpu.ops.attention import _repeat_kv

    B, Hq, d = q.shape
    kc_l = jax.lax.dynamic_index_in_dim(k_cache, layer, 0, keepdims=False)
    vc_l = jax.lax.dynamic_index_in_dim(v_cache, layer, 0, keepdims=False)
    from nano_qwen3tts_tpu.ops.kv_cache import gather_kv

    k_win, v_win = gather_kv(kc_l, vc_l, block_tables, block_size)
    W = k_win.shape[1]
    n_rep = Hq // k_win.shape[2]
    k_all = jnp.concatenate([k_win, k_new[:, None]], axis=1)
    v_all = jnp.concatenate([v_win, v_new[:, None]], axis=1)
    k_all = _repeat_kv(k_all, n_rep)
    v_all = _repeat_kv(v_all, n_rep)
    logits = jnp.einsum(
        "bhd,bshd->bhs", q, k_all, preferred_element_type=jnp.float32
    ) * scale
    pos = jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    mask = (pos < kv_lens_existing[:, None]) | (pos == W)
    logits = jnp.where(mask[:, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhs,bshd->bhd", probs, v_all, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# INT8-KV attend-with-extension. Same structure as the bf16 extend kernel,
# but the cache tiles arrive as int8 with per-slot f32 scales; the scales
# fold into the math instead of materializing a dequantized copy:
#   logits[:, w] = scale_k[w] * (q_folded . k_q[w])
#   out          = (P * scale_v) @ v_q
# Only the scale tails need zeroing beyond kv_len (int8 garbage cannot be
# NaN; a stale f32 scale could be).
# ---------------------------------------------------------------------------


def _decode_kernel_extend_int8(
    layer_ref, bt_ref, len_ref,
    q_ref,  # [1, Hq, F]
    kn_ref,  # [1, 1, F] current-token K (bf16)
    vn_ref,
    kq_hbm,  # [L, S, F] int8
    ks_hbm,  # [L, 1, S] f32 scales
    vq_hbm,
    vs_hbm,
    o_ref,
    kq_vmem,  # [W, F] int8
    ks_vmem,  # [1, W] f32
    vq_vmem,
    vs_vmem,
    sems,  # [4, NB]
    *,
    NB: int,
    bs: int,
    scale: float,
):
    b = pl.program_id(0)
    l = layer_ref[0]
    n = len_ref[b]
    n_blk = (n + bs - 1) // bs
    for i in range(NB):
        @pl.when(i < n_blk)
        def _(i=i):
            blk = bt_ref[b * NB + i]
            start = pl.multiple_of(blk * bs, bs)
            pltpu.make_async_copy(
                kq_hbm.at[l, pl.ds(start, bs)], kq_vmem.at[pl.ds(i * bs, bs)],
                sems.at[0, i],
            ).start()
            pltpu.make_async_copy(
                vq_hbm.at[l, pl.ds(start, bs)], vq_vmem.at[pl.ds(i * bs, bs)],
                sems.at[1, i],
            ).start()
            pltpu.make_async_copy(
                ks_hbm.at[l, :, pl.ds(start, bs)], ks_vmem.at[:, pl.ds(i * bs, bs)],
                sems.at[2, i],
            ).start()
            pltpu.make_async_copy(
                vs_hbm.at[l, :, pl.ds(start, bs)], vs_vmem.at[:, pl.ds(i * bs, bs)],
                sems.at[3, i],
            ).start()

        @pl.when(i >= n_blk)
        def _(i=i):
            ks_vmem[:, pl.ds(i * bs, bs)] = jnp.zeros_like(
                ks_vmem[:, pl.ds(i * bs, bs)]
            )
            vs_vmem[:, pl.ds(i * bs, bs)] = jnp.zeros_like(
                vs_vmem[:, pl.ds(i * bs, bs)]
            )

    for i in range(NB):
        @pl.when(i < n_blk)
        def _(i=i):
            pltpu.make_async_copy(
                kq_hbm.at[l, pl.ds(0, bs)], kq_vmem.at[pl.ds(i * bs, bs)],
                sems.at[0, i],
            ).wait()
            pltpu.make_async_copy(
                vq_hbm.at[l, pl.ds(0, bs)], vq_vmem.at[pl.ds(i * bs, bs)],
                sems.at[1, i],
            ).wait()
            pltpu.make_async_copy(
                ks_hbm.at[l, :, pl.ds(0, bs)], ks_vmem.at[:, pl.ds(i * bs, bs)],
                sems.at[2, i],
            ).wait()
            pltpu.make_async_copy(
                vs_hbm.at[l, :, pl.ds(0, bs)], vs_vmem.at[:, pl.ds(i * bs, bs)],
                sems.at[3, i],
            ).wait()

    q = q_ref[0]  # [Hq, F] bf16
    logits = (
        jax.lax.dot_general(
            q, kq_vmem[...].astype(q.dtype), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
        * ks_vmem[...]  # [1, W] broadcast over heads
    )
    valid = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1) < n
    logits = jnp.where(valid, logits, NEG_INF)
    logit_new = (
        jnp.sum(q * kn_ref[0], axis=-1, keepdims=True).astype(jnp.float32) * scale
    )
    m = jnp.maximum(jnp.max(logits, axis=-1, keepdims=True), logit_new)
    p = jnp.exp(logits - m)
    p_new = jnp.exp(logit_new - m)
    denom = jnp.sum(p, axis=-1, keepdims=True) + p_new
    p_scaled = (p / denom) * vs_vmem[...]  # fold V scales into P
    out = jax.lax.dot_general(
        p_scaled.astype(q.dtype), vq_vmem[...].astype(q.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + (p_new / denom) * vn_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def paged_decode_attention_extend_int8(
    q, k_new, v_new, k_cache, v_cache, layer, block_tables,
    kv_lens_existing, block_size, scale, interpret=False,
):
    """k_cache/v_cache are ops.kv_cache.QuantizedKV (flat [L, S, F])."""
    B, Hq, d = q.shape
    L, S, F = k_cache.q.shape
    Hkv = F // d
    group = Hq // Hkv
    NB = block_tables.shape[1]
    W = NB * block_size

    kf = k_cache.q
    vf = v_cache.q
    ks = k_cache.s.reshape(L, 1, S)
    vs = v_cache.s.reshape(L, 1, S)
    head_of = jnp.arange(Hq) // group
    q_folded = (
        jnp.zeros((B, Hq, Hkv, d), q.dtype)
        .at[:, jnp.arange(Hq), head_of]
        .set(q)
        .reshape(B, Hq, F)
    )
    knf = k_new.reshape(B, 1, F)
    vnf = v_new.reshape(B, 1, F)
    kernel = functools.partial(
        _decode_kernel_extend_int8, NB=NB, bs=block_size, scale=scale
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Hq, F), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec((1, 1, F), lambda b, *_: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, Hq, F), lambda b, *_: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((W, F), jnp.int8),
            pltpu.VMEM((1, W), jnp.float32),
            pltpu.VMEM((W, F), jnp.int8),
            pltpu.VMEM((1, W), jnp.float32),
            pltpu.SemaphoreType.DMA((4, NB)),
        ],
    )
    out_folded = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hq, F), q.dtype),
        interpret=interpret,
    )(
        layer.reshape(1).astype(jnp.int32),
        block_tables.reshape(-1),
        kv_lens_existing,
        q_folded,
        knf,
        vnf,
        kf,
        ks,
        vf,
        vs,
    )
    return out_folded.reshape(B, Hq, Hkv, d)[:, jnp.arange(Hq), head_of]


def paged_decode_attention_extend_int8_xla(
    q, k_new, v_new, k_cache, v_cache, layer, block_tables,
    kv_lens_existing, block_size, scale,
):
    """XLA fallback: dequantize the gathered window, then the bf16 math."""
    kq_l = jax.lax.dynamic_index_in_dim(k_cache.q, layer, 0, keepdims=False)
    ks_l = jax.lax.dynamic_index_in_dim(k_cache.s, layer, 0, keepdims=False)
    vq_l = jax.lax.dynamic_index_in_dim(v_cache.q, layer, 0, keepdims=False)
    vs_l = jax.lax.dynamic_index_in_dim(v_cache.s, layer, 0, keepdims=False)
    from nano_qwen3tts_tpu.ops.attention import _repeat_kv
    from nano_qwen3tts_tpu.ops.kv_cache import gather_kv

    B, Hq, d = q.shape
    Hkv = kq_l.shape[-1] // d  # flat [S, F] value plane
    k_win_q, v_win_q = gather_kv(kq_l, vq_l, block_tables, block_size)
    offs = jnp.arange(block_size, dtype=jnp.int32)
    slots = (
        block_tables[:, :, None] * block_size + offs[None, None, :]
    ).reshape(B, -1)
    k_win = (k_win_q.astype(jnp.float32) * ks_l[slots][..., None]).reshape(
        B, -1, Hkv, d
    )
    v_win = (v_win_q.astype(jnp.float32) * vs_l[slots][..., None]).reshape(
        B, -1, Hkv, d
    )
    W = k_win.shape[1]
    n_rep = Hq // k_win.shape[2]
    k_all = jnp.concatenate([k_win.astype(q.dtype), k_new[:, None]], axis=1)
    v_all = jnp.concatenate([v_win.astype(q.dtype), v_new[:, None]], axis=1)
    k_all = _repeat_kv(k_all, n_rep)
    v_all = _repeat_kv(v_all, n_rep)
    logits = jnp.einsum(
        "bhd,bshd->bhs", q, k_all, preferred_element_type=jnp.float32
    ) * scale
    pos = jnp.arange(W + 1, dtype=jnp.int32)[None, :]
    mask = (pos < kv_lens_existing[:, None]) | (pos == W)
    logits = jnp.where(mask[:, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhs,bshd->bhd", probs, v_all, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)
