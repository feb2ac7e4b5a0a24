"""Isolate which Mosaic kernel blows the compile helper at 64 lanes.

tools/batch64_probe.py (r4, re-run r5 with the paned talker kernel) shows
the 64-lane decode-multi program still SIGKILLs the relay's chipless AOT
compile helper. This probe compiles each burst kernel STANDALONE at a
given batch so the failing kernel is attributable:

    python tools/b64_kernel_probe.py talker  [--batch 64]
    python tools/b64_kernel_probe.py predictor [--batch 64]

Uses the 1.7B shapes and the stable compile cache (a success seeds the
cache for the full program).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[k64 +{time.time()-T0:5.0f}s]", *a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kernel", choices=["talker", "predictor"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument(
        "--flat", action="store_true",
        help="predictor: compile the flat loop-formulation kernel "
        "(_burst_kernel_loop) instead of the pane split; talker: force "
        "pane_size=batch (single flat pane)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nano_qwen3tts_tpu.utils.compile_cache import enable_stable_compile_cache

    enable_stable_compile_cache()

    from nano_qwen3tts_tpu.config import preset_config
    from nano_qwen3tts_tpu.models.weights import (
        init_predictor_params,
        init_talker_params,
    )
    from nano_qwen3tts_tpu.models.transformer import fuse_layer_stack
    from nano_qwen3tts_tpu.ops.quant import (
        quantize_predictor_params,
        quantize_talker_params,
    )

    cfg = preset_config("1.7b")
    tc = cfg.talker_config
    B = args.batch

    if args.kernel == "predictor":
        pc = tc.code_predictor_config

        @jax.jit
        def _init():
            pp = init_predictor_params(pc, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
            pp = dict(pp, layers=fuse_layer_stack(pp["layers"]))
            return quantize_predictor_params(pp, "w8a8")

        pp = jax.block_until_ready(_init())
        log("predictor params ready")
        from nano_qwen3tts_tpu.models.predictor import predictor_spec
        from nano_qwen3tts_tpu.ops.predictor_burst_pallas import (
            predictor_frame_burst,
            supports_burst,
        )

        pspec = predictor_spec(pc)
        assert supports_burst(pp, pspec)
        D = tc.hidden_size
        flat = args.flat
        fn = jax.jit(
            lambda p, h, c, t, k: predictor_frame_burst(
                p, pspec, h, c, t, k, flat=flat
            )
        )
        t0 = time.time()
        toks, emb = jax.block_until_ready(fn(
            pp,
            jnp.zeros((B, D), jnp.bfloat16),
            jnp.zeros((B, D), jnp.bfloat16),
            jnp.full((B,), 0.9, jnp.float32),
            jax.random.PRNGKey(0),
        ))
        log(f"predictor burst B={B}: compiled+ran in {time.time()-t0:.0f}s, "
            f"toks {toks.shape}")
        return

    @jax.jit
    def _init_t():
        tp = init_talker_params(
            tc, jax.random.PRNGKey(0), dtype=jnp.bfloat16, include_text=False
        )
        tp = dict(tp, layers=fuse_layer_stack(tp["layers"]))
        return quantize_talker_params(tp, "w8a8")

    tp = jax.block_until_ready(_init_t())
    from nano_qwen3tts_tpu.models.talker import talker_spec
    from nano_qwen3tts_tpu.ops.kv_cache import make_kv_cache_int8
    from nano_qwen3tts_tpu.ops.talker_burst_pallas import (
        make_burst_params,
        talker_stack_burst,
    )

    spec = talker_spec(tc)
    bp = make_burst_params(tp, spec)
    assert bp is not None
    tp = dict(tp, talker_burst=bp)
    log("talker params ready")
    bs = 1024
    kc, vc = make_kv_cache_int8(
        tc.num_hidden_layers, B + 1, bs, tc.num_key_value_heads, spec.head_dim
    )
    D = tc.hidden_size
    pane = args.batch if args.flat else None
    fn = jax.jit(
        lambda p, x, pos, bt, kl, k, v: talker_stack_burst(
            p, spec, x, pos, bt, kl, k, v, bs, pane_size=pane
        ),
        donate_argnums=(5, 6),
    )
    t0 = time.time()
    hid, kc2, vc2 = jax.block_until_ready(fn(
        tp,
        jnp.zeros((B, D), jnp.bfloat16),
        jnp.full((B,), 10, jnp.int32),
        jnp.arange(1, B + 1, dtype=jnp.int32).reshape(B, 1),
        jnp.full((B,), 10, jnp.int32),
        kc, vc,
    ))
    log(f"talker burst B={B}: compiled+ran in {time.time()-t0:.0f}s, "
        f"hid {hid.shape}")


if __name__ == "__main__":
    main()
