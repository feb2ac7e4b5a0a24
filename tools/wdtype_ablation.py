"""Measured weight-dtype x batch ablation for the serving engine (VERDICT r1
#6/#8): one table that justifies the production default.

Legs (each gated on a global deadline, slowest-first priority):
  1. batch-8 decode ms/frame for quantization in {bf16, int8 w8a16,
     int8 w8a8 (burst kernels), fp8} — the weight-format story;
  2. batch in {1, 8, 16, 32} for the production int8 w8a8 config — the
     batch-amortization story (the burst kernels' per-frame weight stream
     is batch-independent, so per-stream cost keeps dropping).

Prints a markdown table to stdout (paste into PARITY.md) and one JSON line
per measurement to stderr.

Run on the TPU chip: python tools/wdtype_ablation.py
Env: ABLATION_DEADLINE_S (default 840), ABLATION_FRAMES (default 64).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

T0 = time.time()
DEADLINE = float(os.environ.get("ABLATION_DEADLINE_S", "840"))
FRAMES = int(os.environ.get("ABLATION_FRAMES", "64"))
FRAME_SECONDS = 0.08


def log(*a):
    print(f"[ablation +{time.time()-T0:5.0f}s]", *a, file=sys.stderr, flush=True)


def time_left():
    return DEADLINE - (time.time() - T0)


def build(quantization, int8_mode=None, kv="int8", attn="auto"):
    import jax
    import jax.numpy as jnp

    from nano_qwen3tts_tpu.config import EngineConfig, preset_config
    from nano_qwen3tts_tpu.engine.engine import TTSEngine
    from nano_qwen3tts_tpu.models.weights import (
        init_predictor_params,
        init_talker_params,
    )
    from nano_qwen3tts_tpu.utils.compile_cache import (
        enable_stable_compile_cache,
    )

    enable_stable_compile_cache()
    if int8_mode:
        os.environ["INT8_MODE"] = int8_mode
    else:
        os.environ.pop("INT8_MODE", None)
    cfg = preset_config("1.7b")
    tc = cfg.talker_config
    # ABLATION_DATA_SHARDED=force measures the shard_map serving path on the
    # single chip (burst kernels per data shard — the dp-mesh deploy shape)
    ds = os.environ.get("ABLATION_DATA_SHARDED", "auto")
    ecfg = EngineConfig(
        data_sharded=ds,
        max_model_len=1024,
        kvcache_block_size=1024 if attn == "auto" else 128,
        attention_impl=attn,
        max_active_streams=32,
        # MUST match bench.py's buckets: decode_buckets also set the prefill
        # batch padding bucket (runner.run_prefill), so a different tuple
        # silently recompiles every program instead of sharing bench's cache
        decode_buckets=(1, 2, 4, 8, 16, 32),
        prefill_buckets=(128, 256, 512, 1024),
        frames_per_step=8,
        unroll_layers=True,
        quantization=quantization,
        kv_cache_dtype=kv,
        pipeline_depth=2,
    )
    pc = tc.code_predictor_config

    @jax.jit
    def _device_init():
        tp = init_talker_params(
            tc, jax.random.PRNGKey(0), dtype=jnp.bfloat16, include_text=False
        )
        pp = init_predictor_params(pc, jax.random.PRNGKey(1), dtype=jnp.bfloat16)
        return tp, pp

    tparams, pparams = jax.block_until_ready(_device_init())
    engine = TTSEngine(
        ecfg, cfg, tparams, pparams,
        tts_pad_embed=np.zeros(tc.hidden_size, np.float32),
    )
    return engine, tc


def measure(engine, tc, batch):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import run_stream

    # warm the decode bucket AND the exact prefill program run_stream will
    # dispatch: prefill chunks are capped at max_prefill_batch and padded to
    # a decode bucket (engine/_run_batch + runner.run_prefill)
    from nano_qwen3tts_tpu.engine.runner import _bucket

    pb = _bucket(
        min(batch, engine.cfg.max_prefill_batch), engine.cfg.decode_buckets
    )
    engine.runner.warmup(decode_buckets=(batch,), prefill_shapes=[(pb, 128)])
    s = run_stream(engine, tc, batch, FRAMES)
    return s


def main():
    rows = []

    def leg(name, batch, **kw):
        if time_left() < 60:
            log(f"skip {name} (deadline): {time_left():.0f}s left")
            return
        # A failing leg (OOM, over-budget cold compile) must not lose the
        # rows already measured — log it and keep going so the table prints.
        try:
            t0 = time.time()
            engine, tc = build(**kw)
            log(f"{name}: engine built {time.time()-t0:.1f}s "
                f"(attn={engine.runner.attn_impl}, "
                f"predictor={engine.runner.predictor_impl})")
            s = measure(engine, tc, batch)
        except Exception as e:
            import traceback

            log(f"leg {name!r} batch {batch} FAILED: {type(e).__name__}: {e}")
            traceback.print_exc(file=sys.stderr)
            return
        row = {
            "config": name,
            "batch": batch,
            "ms_per_frame_step": round(s * 1e3, 2),
            "per_stream_rtf": round(s / FRAME_SECONDS, 4),
            "codec_tok_s_chip": round(batch / s * 16),
            "attn": engine.runner.attn_impl,
            "predictor": engine.runner.predictor_impl,
        }
        rows.append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
        del engine
        import gc

        gc.collect()

    # ABLATION_LEGS selects a subset: "batches", "formats", or "all"
    # (cold burst-kernel compiles through the TPU relay cost many minutes,
    # so splitting across two invocations is often necessary)
    legs = os.environ.get("ABLATION_LEGS", "all")
    # ABLATION_BATCHES: comma-separated batch subset for the "batches" legs
    # (e.g. "32" to spend one session on just the cold batch-32 compile)
    batches = [
        int(b)
        for b in os.environ.get("ABLATION_BATCHES", "8,16,32,1").split(",")
    ]
    if legs in ("all", "batches"):
        # production config first (most important numbers land first)
        for b in batches:
            leg("int8 w8a8 + burst", b, quantization="int8")
    if legs in ("all", "formats"):
        # weight-format ablation at batch 8, per-layer attention paths
        leg("bf16 (no quant)", 8, quantization=None, kv="bf16", attn="xla")
        leg("int8 w8a16", 8, quantization="int8", int8_mode="w8a16", attn="xla")
        leg("int8 w8a8 (xla attn)", 8, quantization="int8", attn="xla")
        leg("fp8 e4m3 weight-only", 8, quantization="fp8", attn="xla")

    print("\n| config | batch | ms/frame-step | per-stream RTF | codec tok/s/chip | attn | predictor |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['config']} | {r['batch']} | {r['ms_per_frame_step']} | "
            f"{r['per_stream_rtf']} | {r['codec_tok_s_chip']} | {r['attn']} | "
            f"{r['predictor']} |"
        )


if __name__ == "__main__":
    main()
