"""Standalone talker-burst-kernel timing at several batch sizes.

The per-lane cost growth (2.79 ms at B=8 -> 4.83 at 16 -> 8.56 at 32 per
frame-step, PARITY ablation) points at the kernel's per-lane attention
loop. This harness times `talker_stack_burst` alone (no engine, no
predictor) so kernel variants can be compared quickly.

Run on the chip:  python tools/burst_profile.py [B ...]
Env: BURST_REPS (default 30)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nano_qwen3tts_tpu.utils.compile_cache import enable_stable_compile_cache

    enable_stable_compile_cache()

    from nano_qwen3tts_tpu.config import preset_config
    from nano_qwen3tts_tpu.models.talker import talker_spec
    from nano_qwen3tts_tpu.models.transformer import fuse_layer_stack
    from nano_qwen3tts_tpu.models.weights import init_talker_params
    from nano_qwen3tts_tpu.ops.kv_cache import make_kv_cache_int8
    from nano_qwen3tts_tpu.ops.quant import quantize_talker_params
    from nano_qwen3tts_tpu.ops.talker_burst_pallas import (
        make_burst_params,
        talker_stack_burst,
    )

    cfg = preset_config("1.7b")
    tc = cfg.talker_config
    tspec = talker_spec(tc)
    bs = 1024  # one block per lane

    @jax.jit
    def _init():
        tp = init_talker_params(
            tc, jax.random.PRNGKey(0), dtype=jnp.bfloat16, include_text=False
        )
        tp = dict(tp, layers=fuse_layer_stack(tp["layers"]))
        return quantize_talker_params(tp, "w8a8")

    tparams = jax.block_until_ready(_init())
    bp = make_burst_params(tparams, tspec)
    assert bp is not None
    tparams = dict(tparams, talker_burst=bp)

    reps = int(os.environ.get("BURST_REPS", "30"))
    batches = [int(b) for b in sys.argv[1:]] or [8, 16, 32]
    for B in batches:
        num_blocks = B + 1
        kc, vc = make_kv_cache_int8(
            tc.num_hidden_layers, num_blocks, bs, tc.num_key_value_heads,
            tspec.head_dim,
        )
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((B, tc.hidden_size)) * 0.3,
            jnp.bfloat16,
        )
        positions = jnp.full((B,), 200, jnp.int32)
        tables = jnp.arange(1, B + 1, dtype=jnp.int32).reshape(B, 1)
        kv_lens = jnp.full((B,), 200, jnp.int32)

        fn = jax.jit(
            lambda tp, x_, kc_, vc_: talker_stack_burst(
                tp, tspec, x_, positions, tables, kv_lens, kc_, vc_, bs
            ),
            donate_argnums=(2, 3),
        )
        t0 = time.time()
        hid, kc, vc = fn(tparams, x, kc, vc)
        hid.block_until_ready()
        compile_s = time.time() - t0
        # pipelined timing: queue reps calls, block once
        t0 = time.perf_counter()
        for _ in range(reps):
            hid, kc, vc = fn(tparams, x, kc, vc)
        hid.block_until_ready()
        per = (time.perf_counter() - t0) / reps
        print(
            f"B={B:3d}: {per*1e3:6.2f} ms/call piped "
            f"({per/B*1e6:6.1f} us/lane, compile {compile_s:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
