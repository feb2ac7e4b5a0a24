"""Paged KV-cache device layout and slot writes.

TPU-native replacement for the reference's Triton ``store_kvcache_kernel``
(layers/attention.py:10-54): instead of a CUDA scatter kernel, KV rows are
written with XLA scatter (``.at[slots].set``) inside the jitted step, which
Mosaic lowers to dynamic-update-slices — no separate kernel launch, and it
fuses into the surrounding step program.

Layout: one cache per model, ``[num_layers, num_slots, kv_heads, head_dim]``
with ``num_slots = num_blocks * block_size`` flat slot addressing. The minor
dims ``(kv_heads, head_dim)`` are the TPU-tiled dims; block structure is a
pure indexing convention (``slot = block_id * block_size + offset``), so the
same buffer serves the XLA gather fallback and the Pallas paged kernel
(ops/attention.py) without relayout.

Block id 0 is the garbage block (engine/block_manager.py): padded lanes write
there and their values are never read back (their kv_len mask excludes them).
This removes all data-dependent control flow from the fused frame step — the
TPU equivalent of the reference's masked Triton store + CUDA-graph static
buffers (§2.9 N1/N3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_kv_cache(
    num_layers: int,
    num_blocks: int,
    block_size: int,
    kv_heads: int,
    head_dim: int,
    dtype=jnp.bfloat16,
    num_shards: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """num_shards > 0 prepends a data-shard dim (one block pool per data
    shard for the shard_map serving path; num_blocks is then per shard)."""
    shape = (num_layers, num_blocks * block_size, kv_heads, head_dim)
    if num_shards:
        shape = (num_shards,) + shape
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)


def write_kv(
    k_cache_l,  # [S, Hkv, d] array or single-layer QuantizedKV view
    v_cache_l,
    k: jax.Array,  # [N, Hkv, d] new rows
    v: jax.Array,
    slots: jax.Array,  # [N] int32 flat slot ids (garbage slots for pads)
):
    """Scatter N new KV rows into one layer's cache at ``slots``.

    For an int8 cache the rows are quantized here (per-row scales)."""
    if isinstance(k_cache_l, QuantizedKV):
        kq, ks = quantize_kv_rows(k)
        vq, vs = quantize_kv_rows(v)
        n = kq.shape[0]
        return (
            QuantizedKV(
                k_cache_l.q.at[slots].set(kq.reshape(n, -1), mode="drop"),
                k_cache_l.s.at[slots].set(ks, mode="drop"),
            ),
            QuantizedKV(
                v_cache_l.q.at[slots].set(vq.reshape(n, -1), mode="drop"),
                v_cache_l.s.at[slots].set(vs, mode="drop"),
            ),
        )
    k_cache_l = k_cache_l.at[slots].set(k.astype(k_cache_l.dtype), mode="drop")
    v_cache_l = v_cache_l.at[slots].set(v.astype(v_cache_l.dtype), mode="drop")
    return k_cache_l, v_cache_l


def gather_kv(
    k_cache_l: jax.Array,  # [S, Hkv, d]
    v_cache_l: jax.Array,
    block_tables: jax.Array,  # [B, NB] int32
    block_size: int,
) -> tuple[jax.Array, jax.Array]:
    """Materialize per-sequence KV windows ``[B, NB*block_size, Hkv, d]``.

    XLA fallback path for paged decode attention; the Pallas kernel reads
    blocks directly from HBM instead (no materialization).
    """
    B, NB = block_tables.shape
    offsets = jnp.arange(block_size, dtype=jnp.int32)
    slots = (block_tables[:, :, None] * block_size + offsets[None, None, :]).reshape(
        B, NB * block_size
    )
    return k_cache_l[slots], v_cache_l[slots]


def prefill_slot_mapping(block_table: list[int], num_tokens: int, block_size: int):
    """Host-side helper: flat slots for positions 0..num_tokens-1.

    Mirrors reference prepare_prefill's slot construction
    (engine/model_runner/base.py:193-201).
    """
    import numpy as np

    pos = np.arange(num_tokens)
    blocks = np.asarray(block_table, dtype=np.int64)[pos // block_size]
    return (blocks * block_size + pos % block_size).astype(np.int32)


# ---------------------------------------------------------------------------
# INT8 paged KV cache (north-star: "INT8 paged KV-cache").
#
# Per-slot symmetric scales: each written row (one token's K or V across all
# heads) gets one f32 scale = absmax/127. Quantization happens at write time
# (XLA, fused into the step); dequantization happens where the cache is
# read — in VMEM right after the DMA in the Pallas kernel, or in the XLA
# gather fallback. Halves KV HBM footprint and read bandwidth.
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
class QuantizedKV:
    """int8 cache [L, S, Hkv*d] + per-slot scales [L, S] (f32).

    The value plane is stored FLAT in the minor dim (Hkv*d == 128 for the
    talker): a 4-D ``[L, S, Hkv, d]`` int8 array gets an XLA layout with S
    minor-most (``{1,3,2,0}``), and every reshape to the Pallas kernels'
    flat view then relayouts the whole plane (~168 MB copied 4x per frame,
    measured). Head structure is a pure indexing convention at use sites.
    """

    def __init__(self, q, s):
        self.q = q
        self.s = s

    def tree_flatten(self):
        return (self.q, self.s), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.q.dtype


def make_kv_cache_int8(
    num_layers: int, num_blocks: int, block_size: int, kv_heads: int,
    head_dim: int, num_shards: int = 0,
) -> tuple[QuantizedKV, QuantizedKV]:
    S = num_blocks * block_size
    shape = (num_layers, S, kv_heads * head_dim)
    s_shape = (num_layers, S)
    if num_shards:
        shape = (num_shards,) + shape
        s_shape = (num_shards,) + s_shape
    mk = lambda: QuantizedKV(
        jnp.zeros(shape, jnp.int8), jnp.ones(s_shape, jnp.float32)
    )
    return mk(), mk()


def quantize_kv_rows(x: jax.Array):
    """x [..., Hkv, d] -> (int8 rows, f32 scales [...]) per leading index."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=(-2, -1))
    scale = jnp.maximum(absmax / 127.0, 1e-8)
    q = jnp.clip(
        jnp.round(xf / scale[..., None, None]), -127, 127
    ).astype(jnp.int8)
    return q, scale



