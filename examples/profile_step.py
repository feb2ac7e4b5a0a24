"""Micro-profile of the fused frame step components on the current device.

Times, at a given batch size (default 8, int8 weights + int8 KV like the
production bench config):
  - talker decode alone (20-layer paged decode + logits)
  - predictor frame alone (xla scan vs pallas burst)
  - the full fused decode step
  - the 4-frame multi-step per frame

Usage:  python examples/profile_step.py [batch]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def median_time(fn, args, reps=20):
    """(sync_median, pipelined_per_call): sync includes the host<->device
    round trip per call; pipelined queues all calls then blocks once, so it
    approximates pure device execution time when dispatch is cheap."""
    out = fn(*args)
    jax_block(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax_block(out)
        ts.append(time.perf_counter() - t0)
    sync = float(np.median(ts))
    jax_block(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    jax_block(outs[-1])
    piped = (time.perf_counter() - t0) / reps
    return sync, piped


def jax_block(out):
    import jax

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    import jax
    import jax.numpy as jnp

    from nano_qwen3tts_tpu.utils.compile_cache import enable_stable_compile_cache

    enable_stable_compile_cache()

    from nano_qwen3tts_tpu.config import preset_config
    from nano_qwen3tts_tpu.engine.fused_step import (
        make_decode_multi_step,
        make_decode_step,
    )
    from nano_qwen3tts_tpu.models.predictor import predictor_frame, predictor_spec
    from nano_qwen3tts_tpu.models.talker import talker_decode, talker_spec
    from nano_qwen3tts_tpu.models.weights import (
        host_random_init,
        init_predictor_params,
        init_talker_params,
    )
    from nano_qwen3tts_tpu.models.transformer import fuse_layer_stack
    from nano_qwen3tts_tpu.ops.quant import (
        quantize_predictor_params,
        quantize_talker_params,
    )
    from nano_qwen3tts_tpu.ops.kv_cache import make_kv_cache

    noop = jax.jit(lambda a: a + 1)
    one = jnp.zeros((8, 128), jnp.float32)
    t, tp_ = median_time(noop, (one,))
    print(f"no-op dispatch latency     : {t*1e3:7.2f} ms sync / {tp_*1e3:7.2f} ms piped")

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    smoke = os.environ.get("SMOKE") == "1"
    if smoke:
        jax.config.update("jax_platforms", "cpu")
    cfg = preset_config("tiny" if smoke else "1.7b")
    tc = cfg.talker_config
    pc = tc.code_predictor_config
    dtype = jnp.float32 if smoke else jnp.bfloat16
    tspec = talker_spec(tc)
    tspec = type(tspec)(**{**tspec.__dict__, "unroll": True})
    pspec = predictor_spec(pc)

    with host_random_init():
        tparams = init_talker_params(tc, jax.random.PRNGKey(0), dtype=dtype)
        pparams = init_predictor_params(pc, jax.random.PRNGKey(1), dtype=dtype)
    tparams.pop("text_embedding", None)
    tparams.pop("text_projection", None)
    tparams = dict(tparams, layers=fuse_layer_stack(tparams["layers"]))
    pparams = dict(pparams, layers=fuse_layer_stack(pparams["layers"]))
    quant = os.environ.get("QUANT", "w8a8")
    if quant and quant != "none":
        tparams = quantize_talker_params(tparams, quant)
        pparams = quantize_predictor_params(pparams, quant)

    bs, NB, num_blocks = 128, 8, 16 + B * 8
    kvdt = os.environ.get("KV", "int8")
    k_cache, v_cache = make_kv_cache(
        tc.num_hidden_layers, num_blocks, bs, tc.num_key_value_heads,
        tspec.head_dim, dtype if kvdt != "int8" else "int8",
    )
    D, Lt, P = tc.hidden_size, 16, B + 1

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, D)) * 0.3, dtype)
    positions = jnp.full((B,), 200, jnp.int32)
    block_tables = jnp.asarray(
        np.arange(B * NB, dtype=np.int32).reshape(B, NB) + 1
    )
    kv_lens = jnp.full((B,), 200, jnp.int32)
    slots = block_tables[:, 1] * bs + 72
    hidden = jnp.asarray(rng.standard_normal((B, D)) * 0.3, dtype)
    cb0_emb = jnp.asarray(rng.standard_normal((B, D)) * 0.3, dtype)
    temps = jnp.full((B,), 0.9, jnp.float32)
    key = jax.random.PRNGKey(0)

    # --- talker decode alone
    td = jax.jit(
        lambda tp, x_, kc, vc: talker_decode(
            tp, tspec, x_, positions, slots, block_tables, kv_lens, kc, vc, bs,
        )
    )
    t, tp_ = median_time(td, (tparams, x, k_cache, v_cache))
    print(f"talker decode (B={B}, 20L, kv=200): {t*1e3:7.2f} ms sync / {tp_*1e3:7.2f} ms piped")

    # --- predictor frame alone: xla and pallas
    pf_x = jax.jit(
        lambda pp, h, c, k: predictor_frame(pp, pspec, h, c, temps, k)
    )
    t, tp_ = median_time(pf_x, (pparams, hidden, cb0_emb, key))
    print(f"predictor frame XLA        : {t*1e3:7.2f} ms sync / {tp_*1e3:7.2f} ms piped")
    if not smoke:
        try:
            from nano_qwen3tts_tpu.ops.predictor_burst_pallas import (
                predictor_frame_burst,
            )

            pf_p = jax.jit(
                lambda pp, h, c, k: predictor_frame_burst(
                    pp, pspec, h, c, temps, k
                )
            )
            t, tp_ = median_time(pf_p, (pparams, hidden, cb0_emb, key))
            print(f"predictor frame pallas     : {t*1e3:7.2f} ms sync / {tp_*1e3:7.2f} ms piped")
        except Exception as e:
            print(f"predictor burst skipped: {e}")

    # --- full fused decode step (single frame)
    embed_pool = jnp.zeros((P, D), dtype)
    trail_pool = jnp.zeros((P, Lt, D), dtype)
    pool_idx = jnp.arange(1, B + 1, dtype=jnp.int32)
    step_idx = jnp.zeros((B,), jnp.int32)
    pimpl = os.environ.get("PIMPL", "pallas" if not smoke else "xla")
    step = jax.jit(
        make_decode_step(tspec, pspec, bs, Lt, dtype, predictor_impl=pimpl)
    )
    args = (
        tparams, pparams, k_cache, v_cache, embed_pool, trail_pool,
        pool_idx, positions, slots, block_tables, kv_lens, step_idx,
        jnp.ones((B,), jnp.float32), temps, key,
    )
    t, tp_ = median_time(step, args)
    print(f"fused decode step (1 frame): {t*1e3:7.2f} ms sync / {tp_*1e3:7.2f} ms piped")

    # --- 4-frame multi-step
    meta = np.zeros((B, 3 + NB), np.int32)
    meta[:, 0] = np.arange(1, B + 1)
    meta[:, 1] = 200
    meta[:, 3:] = np.asarray(block_tables)
    temps2 = np.ones((2, B), np.float32)
    temps2[1] = 0.9
    ms = jax.jit(
        make_decode_multi_step(
            tspec, pspec, bs, Lt, dtype, n_frames=4, predictor_impl=pimpl
        )
    )
    args = (
        tparams, pparams, k_cache, v_cache, embed_pool, trail_pool,
        jnp.asarray(meta), jnp.asarray(temps2), key,
    )
    t, tp_ = median_time(ms, args)
    print(f"multi-step (4 frames)      : {t*1e3:7.2f} ms sync / {tp_*1e3:7.2f} ms piped"
          f"  ({tp_/4*1e3:.2f} ms/frame piped)")


if __name__ == "__main__":
    main()
