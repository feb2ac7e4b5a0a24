"""Quantization quality: end-to-end codec-token agreement vs the bf16 engine.

VERDICT r4 next #3 / north-star quality clause ("codec-token agreement
within stated delta at the same bit-width"): for each quantized serving
config (int8-w8a8 with the production burst kernels, int8-w8a16, fp8
weight-only), run the PRODUCTION engine frame loop with the SAME weights,
SAME ENGINE_SEED sampling streams, and SAME prompts as an unquantized bf16
engine, and measure codec-token agreement — cb0 (talker) and cb1-15
(predictor) separately — under:

  * greedy    (temperature 1e-4: top-k softmax collapses to argmax — the
               reference asserts AGAINST temp==0, sampling_params.py:14,
               so "greedy" is the near-zero-temperature limit of the same
               sampler);
  * production sampling (talker 1.0 / predictor 0.9, matched PRNG keys).

Because decoding is autoregressive, sampled streams diverge permanently at
the first differing token; the honest end-to-end statistics are therefore
(a) the mean agreement prefix (frames until first divergence), and (b)
elementwise agreement over the whole stream (a floor: after divergence the
streams are conditionally independent). Greedy prefix agreement is the
cleanest quantization-noise signal.

Run on the TPU chip:   python tools/quant_agreement.py [--frames 128]
Prints one JSON line per (config, mode). Results table: PARITY.md
"Quantization quality". The fixed-seed CPU regression pin lives in
tests/test_quant_agreement.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("ENGINE_SEED", "1234")

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[qa +{time.time()-T0:5.0f}s]", *a, file=sys.stderr, flush=True)


def build_engine(quant: str | None, int8_mode: str | None, tc, mc, tp, pp,
                 lanes: int):
    """Production-shaped engine for the given weight format. The quantized
    configs run the real serving path (int8 KV + burst kernels when w8a8);
    bf16 runs the XLA attention stack with a bf16 KV cache."""
    from nano_qwen3tts_tpu.config import EngineConfig
    from nano_qwen3tts_tpu.engine.engine import TTSEngine

    if int8_mode is not None:
        os.environ["INT8_MODE"] = int8_mode
    else:
        os.environ.pop("INT8_MODE", None)
    ecfg = EngineConfig(
        max_model_len=1024,
        kvcache_block_size=1024 if quant else 256,
        quantization=quant,
        kv_cache_dtype="int8" if quant == "int8" and int8_mode == "w8a8"
        else "bf16",
        unroll_layers=True,
        frames_per_step=8,
        pipeline_depth=1,
        max_active_streams=lanes,
        decode_buckets=(lanes,),
        prefill_buckets=(128,),
        eos=2150,
    )
    return TTSEngine(ecfg, mc, dict(tp), dict(pp), num_kvcache_blocks=None)


def run_stream(engine, prompts, max_frames, temp_t, temp_p, lanes):
    """Run `lanes` concurrent requests to max_frames; return frames
    [lanes, max_frames, 16] int32."""
    rids = []
    for i in range(lanes):
        rids.append(engine.add_request(
            prompts[i], None, request_id=f"q{i}", max_frames=max_frames,
            ignore_eos=True, talker_temperature=temp_t,
            predictor_temperature=temp_p, seed=i,
        ))
    got = {r: [] for r in rids}
    while engine.has_work():
        for rid, frame, fin in engine.step():
            if isinstance(frame, Exception):
                raise frame
            if isinstance(frame, list):
                got[rid].append(frame)
    return np.asarray([got[r] for r in rids], np.int32)


def agreement(ref: np.ndarray, got: np.ndarray) -> dict:
    """ref/got [lanes, F, 16] -> agreement stats."""
    lanes, F, _ = ref.shape
    eq = ref == got  # [lanes, F, 16]
    frame_eq = eq.all(axis=2)  # [lanes, F]
    # prefix: frames until first full-frame divergence, per lane
    first_bad = np.where(
        frame_eq.all(axis=1), F, np.argmin(frame_eq, axis=1)
    )
    return {
        # first frame: both engines see the IDENTICAL input state (the
        # prompt), so this is the clean per-step quantization-noise
        # statistic — after it, autoregressive divergence compounds
        "first_frame_agree": round(float(eq[:, 0, :].mean()), 4),
        "cb0_agree": round(float(eq[:, :, 0].mean()), 4),
        "cb1_15_agree": round(float(eq[:, :, 1:].mean()), 4),
        "frame_agree": round(float(frame_eq.mean()), 4),
        "mean_prefix_frames": round(float(first_bad.mean()), 1),
        "identical_streams": int(frame_eq.all(axis=1).sum()),
        "lanes": lanes,
        "frames": F,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=128)
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--configs", default="int8-w8a8,int8-w8a16,fp8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nano_qwen3tts_tpu.config import preset_config
    from nano_qwen3tts_tpu.models.weights import (
        host_random_init,
        init_predictor_params,
        init_talker_params,
    )
    from nano_qwen3tts_tpu.utils.compile_cache import enable_stable_compile_cache

    enable_stable_compile_cache()
    cfg = preset_config("1.7b")
    tc = cfg.talker_config
    with host_random_init():
        tp = init_talker_params(tc, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        pp = init_predictor_params(
            tc.code_predictor_config, jax.random.PRNGKey(1), dtype=jnp.bfloat16
        )
    rng = np.random.default_rng(7)
    prompts = [
        (rng.standard_normal((96, tc.hidden_size)) * 0.3).astype(np.float32)
        for _ in range(args.lanes)
    ]
    modes = [("greedy", 1e-4, 1e-4), ("sampled", 1.0, 0.9)]

    log("building bf16 reference engine")
    ref_engine = build_engine(None, None, tc, cfg, tp, pp, args.lanes)
    refs = {}
    for name, tt, tpp in modes:
        refs[name] = run_stream(
            ref_engine, prompts, args.frames, tt, tpp, args.lanes
        )
        log(f"bf16 {name}: {refs[name].shape}")
    del ref_engine

    for quant_cfg in args.configs.split(","):
        quant, _, m = quant_cfg.partition("-")
        int8_mode = m or ("w8a8" if quant == "int8" else None)
        if quant == "fp8":
            int8_mode = None
        log(f"building {quant_cfg} engine")
        eng = build_engine(quant, int8_mode, tc, cfg, tp, pp, args.lanes)
        info = {
            "config": quant_cfg,
            "attn": eng.runner.attn_impl,
            "predictor": eng.runner.predictor_impl,
            "kv": eng.cfg.kv_cache_dtype,
        }
        for name, tt, tpp in modes:
            got = run_stream(eng, prompts, args.frames, tt, tpp, args.lanes)
            row = dict(info, mode=name, **agreement(refs[name], got))
            print(json.dumps(row), flush=True)
            log(row)
        del eng


if __name__ == "__main__":
    main()
