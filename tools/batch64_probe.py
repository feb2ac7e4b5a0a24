"""Batch-64 throughput probe (PARITY roofline follow-up).

The roofline attribution (PARITY.md) says the decode frame step is
latency-bound, not bandwidth-bound: the burst kernels' per-frame weight
stream is batch-invariant, so per-stream cost keeps falling as lanes fill
— 32 lanes measured 108,965 codec tok/s/chip. This probe asks whether 64
lanes keeps climbing (the prediction: roughly halves per-stream cost again
until KV/activation traffic bites) or hits a kernel limit (VMEM for the
64-lane burst attention, or the batched-attention formulation's scratch).

Builds EXACTLY the bench.py engine at BENCH_MAX_BATCH=64 (so a later
`BENCH_MAX_BATCH=64 python bench.py` run shares every compiled program)
but warms ONLY the 64-lane decode + the (8,64) prefill it needs — the
64-slot KV pool changes the cache shape, so none of the default bench's
programs apply and each avoided compile saves ~20 min through the relay.

Run on the TPU chip:  python tools/batch64_probe.py
Prints one JSON line per measurement to stdout.

RESULT (2026-08-21, v5e via the axon relay, two attempts): the 64-lane
burst decode program is UNMEASURABLE on this infrastructure — the relay's
chipless AOT compile helper is SIGKILLed (~20 min into the Mosaic compile,
reproducibly: `remote_compile: HTTP 500: tpu_compile_helper subprocess
exit signal SIGKILL (9)`) before the program exists. The 32-lane variant
of the same kernel compiles in ~19 min, so the 64-lane batched-attention
formulation crosses the helper's memory budget, not a kernel-validity
line. Measuring the 64-lane tier needs either a direct-attached chip
(no compile-helper cap) or a lower-memory kernel formulation (e.g.
splitting the batched attention into two 32-lane panes). Until then the
measured throughput optimum stays batch 32 (PARITY.md ablation table).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

os.environ.setdefault("BENCH_MAX_BATCH", "64")

FRAME_SECONDS = 0.08
T0 = time.time()


def log(*a):
    print(f"[b64 +{time.time()-T0:5.0f}s]", *a, file=sys.stderr, flush=True)


def main():
    import bench

    engine, tc = bench.build_engine(smoke=False)
    bmax = int(os.environ["BENCH_MAX_BATCH"])
    tb = engine.cfg.prefill_buckets[0]
    pb = engine.cfg.max_prefill_batch
    t0 = time.time()
    engine.runner.warmup(
        decode_buckets=(bmax,), prefill_shapes=[(pb, tb)]
    )
    log(f"warmup(batch-{bmax} decode + ({pb},{tb}) prefill) "
        f"{time.time()-t0:.1f}s")
    for batch in (bmax,):
        s = bench.run_stream(engine, tc, batch, n_frames=64)
        fps = batch / s
        row = {
            "batch": batch,
            "ms_per_frame_step": round(s * 1e3, 2),
            "per_stream_rtf": round(s / FRAME_SECONDS, 4),
            "frames_per_s_chip": round(fps, 1),
            "codec_tok_s_chip": round(fps * 16),
        }
        print(json.dumps(row), flush=True)
        log(row)


if __name__ == "__main__":
    main()
