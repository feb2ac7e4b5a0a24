"""Measure the codec window-decode cost on the real serving shapes.

VERDICT r3 weak #1: the driver-captured bench measured 69.2 ms/window on a
raw (1,16,16) unbucketed dispatch while PARITY claimed 7.3 ms — this tool
produces the reconciliation table: for each (batch, window) the serving
path actually runs (server streaming windows T=4 first / T=12 inner,
bucketed to 5/13 by SpeechTokenizer._bucket; DecodeWorker micro-batches to
power-of-two batch buckets), it reports

  * device-only window time (N dispatches in flight, block on the last:
    amortized device throughput, no host transfer in the timed region);
  * the serving cycle (dispatch_pcm16 + fetch, depth-4 pipeline — what the
    server's DecodeWorker + FETCH_EXECUTOR do);
  * one cold fetch (the relay round trip).

Usage:  python tools/codec_probe.py [--dtype float32] [--legs serving,raw16]
"""

from __future__ import annotations

import argparse
import time
from collections import deque

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--param-dtype", default="float32",
                    choices=["float32", "bfloat16", "int8"])
    ap.add_argument("--legs", default="serving,raw16")
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--windows", default="12,4")
    ap.add_argument("--reps", type=int, default=24)
    args = ap.parse_args()

    from nano_qwen3tts_tpu.utils.compile_cache import enable_stable_compile_cache
    enable_stable_compile_cache()
    import jax
    import jax.numpy as jnp
    from nano_qwen3tts_tpu.audio.codec import CodecConfig, SpeechTokenizer

    print(f"platform={jax.devices()[0].platform} compute={args.dtype} "
          f"params={args.param_dtype}", flush=True)
    codec = SpeechTokenizer(CodecConfig(
        compute_dtype=args.dtype, param_dtype=args.param_dtype
    ))
    rng = np.random.default_rng(0)
    legs = args.legs.split(",")
    reps = args.reps

    def timed_device_only(dev_codes, n=reps):
        """n dispatches in flight, block on the last -> s/window."""
        out = codec._decode_pcm16_jit(codec.params, dev_codes)
        jax.block_until_ready(out)  # warm + settle
        t0 = time.time()
        for _ in range(n):
            out = codec._decode_pcm16_jit(codec.params, dev_codes)
        jax.block_until_ready(out)
        return (time.time() - t0) / n

    def timed_serving_cycle(codes_np, n=reps, depth=4):
        """dispatch_pcm16 + host fetch, depth-d pipeline -> s/window."""
        pend = deque()
        for _ in range(depth):
            dev, _nv = codec.dispatch_pcm16(codes_np)
            pend.append(dev)
        t0 = time.time()
        for _ in range(n):
            dev, _nv = codec.dispatch_pcm16(codes_np)
            pend.append(dev)
            np.asarray(pend.popleft())
        while pend:
            np.asarray(pend.popleft())
        return (time.time() - t0) / (n + depth)

    if "serving" in legs:
        for B in (int(b) for b in args.batches.split(",")):
            for T in (int(t) for t in args.windows.split(",")):
                codes = rng.integers(0, 2048, size=(B, 16, T), dtype=np.int64)
                tb = codec._bucket(T)
                padded = jnp.asarray(codec._pad_codes(
                    codec.normalize_codes(codes), tb))
                # warm (compile) through the real path, then measure
                t0 = time.time()
                dev, _ = codec.dispatch_pcm16(codes)
                np.asarray(dev)
                t_compile = time.time() - t0
                dev_s = timed_device_only(padded)
                cyc_s = timed_serving_cycle(codes)
                # one cold fetch: dispatch one, wait compute, then time fetch
                d2, _ = codec.dispatch_pcm16(codes)
                jax.block_until_ready(d2)
                t0 = time.time()
                np.asarray(d2)
                fetch_s = time.time() - t0
                print(
                    f"B={B:3d} T={T:3d}->bucket {tb:3d}: "
                    f"device {dev_s*1e3:7.2f} ms/window "
                    f"({dev_s/B*1e3:6.2f}/stream)  "
                    f"serve-cycle {cyc_s*1e3:7.2f} ms  "
                    f"fetch {fetch_s*1e3:6.2f} ms  "
                    f"(first-call incl compile/cache-load {t_compile:.2f}s)",
                    flush=True,
                )

    if "raw16" in legs:
        # the r3 bench's exact shape: raw (1,16,16), no bucketing
        dev_codes = jnp.asarray(np.zeros((1, 16, 16), np.int32))
        t0 = time.time()
        jax.block_until_ready(codec._decode_pcm16_jit(codec.params, dev_codes))
        t_compile = time.time() - t0
        dev_s = timed_device_only(dev_codes)

        def _dispatch():
            out = codec._decode_pcm16_jit(codec.params, dev_codes)
            try:
                out.copy_to_host_async()
            except Exception:
                pass
            return out

        pend = deque(_dispatch() for _ in range(4))
        t0 = time.time()
        for _ in range(12):
            pend.append(_dispatch())
            np.asarray(pend.popleft())
        while pend:
            np.asarray(pend.popleft())
        r3_s = (time.time() - t0) / 16
        print(
            f"raw (1,16,16) [r3 bench shape]: device {dev_s*1e3:7.2f} ms  "
            f"r3-style cycle {r3_s*1e3:7.2f} ms  "
            f"(first-call {t_compile:.2f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
