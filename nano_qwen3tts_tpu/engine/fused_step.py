"""Pure-function factories for the fused frame steps.

Factored out of the Runner so the same functions serve the engine, the
multi-chip dry run, and compile checks. See engine/runner.py for the design
narrative; these are the functions that replace the reference's CUDA-graph
capture families and the per-frame ZMQ round trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nano_qwen3tts_tpu.models.predictor import predictor_frame
from nano_qwen3tts_tpu.models.talker import talker_decode, talker_prefill
from nano_qwen3tts_tpu.models.transformer import AttnSpec
from nano_qwen3tts_tpu.ops.sampling_ops import sample_top_k


def write_codes_pool(codes_pool, frames_nbt, pool_idx, base):
    """Scatter a dispatch's frames into the device-resident codes pool.

    codes_pool [P, F, 16] int32 — per-slot history of generated codec
    frames (frame f of slot p at codes_pool[p, f]). frames_nbt [N, B, 16];
    base [B] = frames already emitted per lane at dispatch time. Padded
    lanes carry pool_idx 0 (the garbage row). The pool lets the serving
    layer decode streaming PCM windows WITHOUT round-tripping the codes
    through the host (server/app.py pooled decode path): the reference
    re-uploads every decode window to the codec
    (examples/server.py:645-673); here the window never leaves the device.
    """
    n = frames_nbt.shape[0]
    cols = base[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]  # [B, N]
    return codes_pool.at[pool_idx[:, None], cols].set(
        frames_nbt.transpose(1, 0, 2), mode="drop"
    )


def make_frame_tail(
    pspec: AttnSpec, trail_len: int, dtype, predictor_impl: str = "xla"
):
    """predictor_impl="pallas" routes the 16-step predictor burst through
    the VMEM-resident Pallas kernel (ops/predictor_burst_pallas.py) — ~1.7x
    faster on v5e and sampling-equivalent for the same key."""
    if predictor_impl == "pallas":
        from nano_qwen3tts_tpu.ops.predictor_burst_pallas import (
            predictor_frame_burst as _predictor_frame,
        )
    else:
        _predictor_frame = predictor_frame

    def frame_tail(
        tparams, pparams, hidden, logits, trail_pool, embed_pool,
        pool_idx, step_idx, temps_t, temps_p, key,
    ):
        k1, k2 = jax.random.split(key)
        cb0 = sample_top_k(logits, temps_t, k1)  # [B]
        cb0_emb = tparams["codec_embedding"][cb0]  # [B, D]
        toks, pred_sum = _predictor_frame(
            pparams, pspec, hidden, cb0_emb, temps_p, k2
        )
        sum16 = cb0_emb.astype(jnp.float32) + pred_sum.astype(jnp.float32)
        trail = trail_pool[pool_idx, jnp.minimum(step_idx, trail_len - 1)]
        next_embed = (sum16 + trail.astype(jnp.float32)).astype(dtype)
        embed_pool = embed_pool.at[pool_idx].set(next_embed)
        frame = jnp.concatenate([cb0[:, None], toks], axis=1)  # [B, 16]
        return frame, embed_pool

    return frame_tail


def make_decode_step(
    tspec: AttnSpec, pspec: AttnSpec, block_size: int, trail_len: int, dtype,
    attn_impl: str = "xla", predictor_impl: str = "xla", with_codes: bool = False,
):
    """One decode frame: talker decode (paged) -> cb0 -> predictor -> pools.

    with_codes=True adds a ``codes_pool`` argument (after trail_pool) and
    output (after embed_pool): the frame is also scattered into the
    device-resident codes history (see write_codes_pool)."""
    frame_tail = make_frame_tail(pspec, trail_len, dtype, predictor_impl)

    def decode_step(
        tparams, pparams, k_cache, v_cache, embed_pool, trail_pool,
        *rest,
    ):
        if with_codes:
            codes_pool = rest[0]
            rest = rest[1:]
        (
            pool_idx, positions, slots, block_tables, kv_lens,
            step_idx, temps_t, temps_p, key,
        ) = rest
        x = embed_pool[pool_idx]  # [B, D]
        logits, hidden, k_cache, v_cache = talker_decode(
            tparams, tspec, x, positions, slots, block_tables, kv_lens,
            k_cache, v_cache, block_size, attn_impl,
        )
        frame, embed_pool = frame_tail(
            tparams, pparams, hidden, logits, trail_pool, embed_pool,
            pool_idx, step_idx, temps_t, temps_p, key,
        )
        if with_codes:
            codes_pool = write_codes_pool(
                codes_pool, frame[None], pool_idx, step_idx
            )
            return k_cache, v_cache, embed_pool, codes_pool, frame
        return k_cache, v_cache, embed_pool, frame

    return decode_step


def make_prefill_step(
    tspec: AttnSpec, pspec: AttnSpec, trail_len: int, dtype,
    block_size: int = 128, predictor_impl: str = "xla", with_codes: bool = False,
):
    """Prefill + first frame: talker prefill -> cb0 -> predictor -> pools.

    Positions/valid-mask/KV-slots are derived in-jit from one packed int32
    metadata array (pool_idx, length, step_idx, block_table per row) — a
    single metadata transfer per prefill dispatch. with_codes=True threads
    the codes pool through (see make_decode_step).
    """
    frame_tail = make_frame_tail(pspec, trail_len, dtype, predictor_impl)

    def prefill_step(
        tparams, pparams, k_cache, v_cache, embed_pool, trail_pool,
        *rest,
    ):
        if with_codes:
            codes_pool = rest[0]
            rest = rest[1:]
        # embeds [B, T, D]; meta [B, 3+NB] int32 (pool_idx, length,
        # step_idx, block_table); temps [2, B] f32; seed [] int32
        embeds, meta, temps, seed = rest
        B, T, _ = embeds.shape
        pool_idx = meta[:, 0]
        lengths = meta[:, 1]
        step_idx = meta[:, 2]
        tables = meta[:, 3:]
        temps_t, temps_p = temps[0], temps[1]
        key = jax.random.PRNGKey(seed)
        positions = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None, :], (B, T)
        )
        blk = jnp.take_along_axis(tables, positions // block_size, axis=1)
        slots = jnp.where(
            positions < lengths[:, None],
            blk * block_size + positions % block_size,
            0,  # garbage block for pads
        ).reshape(B * T)
        logits, hidden, k_cache, v_cache = talker_prefill(
            tparams, tspec, embeds, positions, lengths, slots, k_cache, v_cache
        )
        frame, embed_pool = frame_tail(
            tparams, pparams, hidden, logits, trail_pool, embed_pool,
            pool_idx, step_idx, temps_t, temps_p, key,
        )
        if with_codes:
            codes_pool = write_codes_pool(
                codes_pool, frame[None], pool_idx, step_idx
            )
            return k_cache, v_cache, embed_pool, codes_pool, frame
        return k_cache, v_cache, embed_pool, frame

    return prefill_step


def make_decode_multi_step(
    tspec: AttnSpec,
    pspec: AttnSpec,
    block_size: int,
    trail_len: int,
    dtype,
    n_frames: int,
    attn_impl: str = "xla",
    predictor_impl: str = "xla",
    with_codes: bool = False,
):
    """N decode frames in one dispatch: ``lax.scan`` over the fused frame
    step, with KV slots/positions advanced on device.

    Amortizes per-step host work (and the device->host token fetch) over
    ``n_frames`` frames; N=4 matches the server's 4-frame PCM chunk policy,
    so streaming granularity is unchanged. Lanes that sample EOS mid-scan
    keep computing (into their own KV blocks — freed at finish) and the host
    discards their tail frames; this trades rare wasted frames for zero
    data-dependent control flow.

    Caller must pre-allocate block tables covering ``kv_len0 + n_frames``
    entries per lane.
    """
    frame_tail = make_frame_tail(pspec, trail_len, dtype, predictor_impl)

    def multi_step(
        tparams, pparams, k_cache, v_cache, embed_pool, trail_pool,
        *rest,
        # meta  [B, 3+NB] int32: pool_idx, kv_len0, step_idx0, block_table
        # temps [2, B] f32: talker temps, predictor temps
        # key   PRNG key (device-resident, advanced in-jit)
    ):
        """Returns (k_cache, v_cache, embed_pool, meta', key', frames)
        (with_codes=True: codes_pool' inserted after embed_pool).

        ``meta'`` has kv_len/step_idx advanced by n_frames and ``key'`` is a
        fresh key — both stay on device, so a steady-state decode stretch
        needs ZERO host->device transfers: the engine feeds the returned
        meta/key straight into the next dispatch (engine/runner.py caches
        them; any membership/block-table change invalidates and re-uploads).
        """
        if with_codes:
            codes_pool = rest[0]
            rest = rest[1:]
        meta, temps, key = rest
        pool_idx = meta[:, 0]
        kv_len0 = meta[:, 1]
        step_idx0 = meta[:, 2]
        block_tables = meta[:, 3:]
        temps_t, temps_p = temps[0], temps[1]
        def body(carry, j):
            k_cache, v_cache, embed_pool, key = carry
            kv_len = kv_len0 + j  # entries before this frame's write
            positions = kv_len + 1  # reference off-by-one (engine/sequence.py)
            blk = jnp.take_along_axis(
                block_tables, (kv_len // block_size)[:, None], axis=1
            )[:, 0]
            slots = blk * block_size + kv_len % block_size
            x = embed_pool[pool_idx]
            logits, hidden, k_cache, v_cache = talker_decode(
                tparams, tspec, x, positions, slots, block_tables, kv_len + 1,
                k_cache, v_cache, block_size, attn_impl,
            )
            key, sub = jax.random.split(key)
            frame, embed_pool = frame_tail(
                tparams, pparams, hidden, logits, trail_pool, embed_pool,
                pool_idx, step_idx0 + j, temps_t, temps_p, sub,
            )
            return (k_cache, v_cache, embed_pool, key), frame

        (k_cache, v_cache, embed_pool, key), frames = jax.lax.scan(
            body, (k_cache, v_cache, embed_pool, key),
            jnp.arange(n_frames, dtype=jnp.int32),
        )
        if with_codes:
            codes_pool = write_codes_pool(codes_pool, frames, pool_idx, step_idx0)
        meta = meta.at[:, 1].add(n_frames).at[:, 2].add(n_frames)
        if with_codes:
            return k_cache, v_cache, embed_pool, codes_pool, meta, key, frames
        return k_cache, v_cache, embed_pool, meta, key, frames  # [N, B, 16]

    return multi_step


# ---------------------------------------------------------------------------
# Data-sharded serving steps (multi-host / multi-chip deployment shape)
#
# The production scaling form (SCALING.md): every piece of per-request
# serving state — KV block pool, embed/trail pools, batch metadata, PRNG
# key — carries a leading [n_data] shard dim and lives sharded over the
# mesh "data" axis. The step runs under `jax.shard_map` with the data axis
# MANUAL (each shard computes on its own [0]-indexed slice) and the model
# axis left to GSPMD (TP collectives ride ICI inside a shard). KV writes,
# attention, sampling, and pool updates are then shard-local by
# construction: the compiled program contains ZERO cross-data collectives
# (pinned by tests/test_engine_mesh.py via
# parallel.distributed.collective_span_report), so the data axis scales
# linearly across hosts. The scheduler gives each request a shard for its
# lifetime (Sequence.data_shard).
#
# When the model axis is 1, each shard body is a single device, so the
# single-chip Pallas burst kernels run unchanged inside the shard — the
# dp-mesh engine keeps single-chip per-chip performance.
#
# This replaces the reference's per-process data parallelism (independent
# server processes per GPU, SURVEY §2.10 DP row) with one logical engine
# spanning hosts.
# ---------------------------------------------------------------------------


def _index0(tree):
    """Drop the leading (size-1 inside shard_map) shard dim of every leaf."""
    return jax.tree.map(lambda a: a[0], tree)


def _expand0(tree):
    """Re-add the leading shard dim to every leaf."""
    return jax.tree.map(lambda a: a[None], tree)


def _shard_map_axes(mesh) -> dict:
    """shard_map kwargs for the data-sharded step: manual over "data" with
    the model axis left to GSPMD when tp>1. When the model axis is 1 the
    map is FULLY manual — required for the Pallas burst kernels inside the
    shard body (Mosaic custom calls refuse to run under an auto axis, even
    a size-1 one: "Mosaic kernels cannot be automatically partitioned")."""
    if int(mesh.shape["model"]) > 1:
        return {"axis_names": {"data"}}  # model stays GSPMD-auto
    return {}  # all axes manual


def make_data_sharded_decode_multi_step(
    tspec, pspec, block_size, trail_len, dtype, n_frames, mesh,
    attn_impl="xla", predictor_impl="xla", with_codes=False,
):
    """shard_map-wrapped ``make_decode_multi_step``: args/results carry a
    leading [n_data] dim sharded over "data"; weights stay replicated on
    "data" (GSPMD-sharded on "model" when tp>1)."""
    from jax.sharding import PartitionSpec as P

    local = make_decode_multi_step(
        tspec, pspec, block_size, trail_len, dtype, n_frames,
        attn_impl=attn_impl, predictor_impl=predictor_impl,
        with_codes=with_codes,
    )

    if with_codes:
        def sharded(tparams, pparams, kc, vc, pool, trail, codes, meta,
                    temps, keys):
            kc2, vc2, pool2, codes2, meta2, key2, frames = local(
                tparams, pparams, _index0(kc), _index0(vc), pool[0],
                trail[0], codes[0], meta[0], temps[0], keys[0],
            )
            return (
                _expand0(kc2), _expand0(vc2), pool2[None], codes2[None],
                meta2[None], key2[None], frames[None],
            )
        n_state = 7
    else:
        def sharded(tparams, pparams, kc, vc, pool, trail, meta, temps, keys):
            kc2, vc2, pool2, meta2, key2, frames = local(
                tparams, pparams, _index0(kc), _index0(vc), pool[0], trail[0],
                meta[0], temps[0], keys[0],
            )
            return (
                _expand0(kc2), _expand0(vc2), pool2[None], meta2[None],
                key2[None], frames[None],
            )
        n_state = 6

    d = P("data")
    return jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P()) + (d,) * (n_state + 1),
        out_specs=(d,) * n_state,
        check_vma=False,
        **_shard_map_axes(mesh),
    )


def make_data_sharded_prefill_step(
    tspec, pspec, trail_len, dtype, block_size, mesh, predictor_impl="xla",
    with_codes=False,
):
    """shard_map-wrapped ``make_prefill_step``; the scalar seed is folded
    with the shard index so shards draw decorrelated sampling streams."""
    from jax.sharding import PartitionSpec as P

    local = make_prefill_step(
        tspec, pspec, trail_len, dtype, block_size,
        predictor_impl=predictor_impl, with_codes=with_codes,
    )

    if with_codes:
        def sharded(tparams, pparams, kc, vc, pool, trail, codes, embeds,
                    meta, temps, seed):
            seed = seed + (7919 * jax.lax.axis_index("data")).astype(jnp.int32)
            kc2, vc2, pool2, codes2, frame = local(
                tparams, pparams, _index0(kc), _index0(vc), pool[0],
                trail[0], codes[0], embeds[0], meta[0], temps[0], seed,
            )
            return (
                _expand0(kc2), _expand0(vc2), pool2[None], codes2[None],
                frame[None],
            )
        n_in, n_out = 8, 5
    else:
        def sharded(tparams, pparams, kc, vc, pool, trail, embeds, meta,
                    temps, seed):
            seed = seed + (7919 * jax.lax.axis_index("data")).astype(jnp.int32)
            kc2, vc2, pool2, frame = local(
                tparams, pparams, _index0(kc), _index0(vc), pool[0], trail[0],
                embeds[0], meta[0], temps[0], seed,
            )
            return _expand0(kc2), _expand0(vc2), pool2[None], frame[None]
        n_in, n_out = 7, 4

    d = P("data")
    return jax.shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P()) + (d,) * n_in + (P(),),
        out_specs=(d,) * n_out,
        check_vma=False,
        **_shard_map_axes(mesh),
    )
