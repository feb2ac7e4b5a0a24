"""Full-stack serving benchmark: HTTP server + N concurrent streaming clients.

Measures, through the real serving surface (asyncio HTTP server, streaming
chunk policy, micro-batched codec decode — server/app.py), per-stream RTF
and first/inner-chunk latency at increasing concurrency. This is the
TPU-native equivalent of driving the reference's examples/server.py with
examples/client.py -j N (reference README.md:94-103 tables).

Runs with seeded random 1.7B-shape weights and the production serving
config (int8 weights + int8 paged KV, whole-stack talker burst kernel,
4-frame dispatch). Requests pin ``max_frames`` so stream durations are
deterministic under random weights.

    python examples/serve_bench.py [--ccu 1,2,8] [--frames 150] [--port N]
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from common import stub_tokenizer  # noqa: E402


def build_1p7b_interface(max_ccu: int = 8):
    import jax
    import jax.numpy as jnp

    from nano_qwen3tts_tpu.utils.compile_cache import enable_stable_compile_cache

    enable_stable_compile_cache()

    from nano_qwen3tts_tpu.audio.codec import CodecConfig, SpeechTokenizer
    from nano_qwen3tts_tpu.config import EngineConfig, preset_config
    from nano_qwen3tts_tpu.interface import Qwen3TTSInterface
    from nano_qwen3tts_tpu.models.weights import (
        host_random_init,
        init_predictor_params,
        init_talker_params,
    )

    cfg = preset_config("1.7b")
    cfg.tts_bos_token_id, cfg.tts_eos_token_id, cfg.tts_pad_token_id = 505, 506, 507
    cfg.talker_config.spk_id = {"vivian": 3000}
    cfg.talker_config.codec_language_id = {"english": 4100}
    tc = cfg.talker_config
    with host_random_init():
        tp = init_talker_params(tc, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        pp = init_predictor_params(
            tc.code_predictor_config, jax.random.PRNGKey(1), dtype=jnp.bfloat16
        )
    # The throughput tier (VERDICT r3 next #9): requesting a 32-CCU row
    # widens the lane/bucket caps so 32 concurrent streams share one chip
    # at the measured batch-32 optimum (PARITY ablation table) instead of
    # queueing at 16.
    ecfg = EngineConfig(
        max_model_len=1024,
        kvcache_block_size=1024,  # one block per lane -> burst kernel
        quantization="int8",
        kv_cache_dtype="int8",
        unroll_layers=True,
        frames_per_step=4,  # server chunk granularity
        pipeline_depth=1,
        max_active_streams=32 if max_ccu > 16 else 16,
        decode_buckets=(1, 2, 4, 8, 16, 32) if max_ccu > 16
        else (1, 2, 4, 8, 16),
        prefill_buckets=(128, 256),
        max_prefill_batch=4,
    )
    codec = SpeechTokenizer(
        CodecConfig(
            compute_dtype=os.environ.get("CODEC_COMPUTE_DTYPE", "float32")
        ),
        seed=0,
    )
    return Qwen3TTSInterface(
        engine_config=ecfg, model_config=cfg, talker_params=tp,
        predictor_params=pp, tokenizer=stub_tokenizer, speech_tokenizer=codec,
    )


def run_clients(port: int, ccu: int, frames: int):
    from nano_qwen3tts_tpu.server.client import stream_speech

    payload = {
        "input": "The quick brown fox jumps over the lazy dog near the riverbank.",
        "mode": "voice_design",
        "instruct": "Male, calm",
        "language": "English",
        "max_frames": frames,
    }
    results = [None] * ccu

    def worker(i):
        results[i] = stream_speech("127.0.0.1", port, dict(payload))[1]

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(ccu)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    stats = [r for r in results if r]
    rtfs = [s["rtf"] for s in stats if s["rtf"]]
    first = [s["first_chunk_ms"] for s in stats if s["first_chunk_ms"]]
    inner = [s["inner_chunk_ms"] for s in stats if s["inner_chunk_ms"]]
    return {
        "ccu": ccu,
        "rtf_p50": float(np.median(rtfs)) if rtfs else None,
        "rtf_max": float(np.max(rtfs)) if rtfs else None,
        "first_chunk_p50_ms": float(np.median(first)) if first else None,
        "inner_chunk_p50_ms": float(np.median(inner)) if inner else None,
        "audio_s_total": float(sum(s["audio_s"] for s in stats)),
        "wall_s": wall,
    }


async def amain(args):
    from nano_qwen3tts_tpu.server.app import TTSServer

    ccus_all = [int(c) for c in args.ccu.split(",")]
    iface = build_1p7b_interface(max_ccu=max(ccus_all))
    server = TTSServer(iface)
    await server.start(host="127.0.0.1", port=args.port, warmup=True)
    print("[serve_bench] server up, running load...", file=sys.stderr, flush=True)
    loop = asyncio.get_running_loop()
    ccus = ccus_all
    # warm the HTTP+prefill path once at each concurrency step's bucket
    await loop.run_in_executor(None, run_clients, args.port, 1, 8)
    rows = []
    for ccu in ccus:
        row = await loop.run_in_executor(
            None, run_clients, args.port, ccu, args.frames
        )
        rows.append(row)
        print(json.dumps(row), flush=True)
    await server.stop()
    print("[serve_bench] done", file=sys.stderr)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=17901)
    ap.add_argument("--ccu", default="1,2,8")
    ap.add_argument("--frames", type=int, default=150)
    args = ap.parse_args()
    asyncio.run(amain(args))
