"""Benchmark: 1.7B two-stage TTS serving on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Primary metric: batch-1 streaming RTF for the 1.7B model (generation time /
audio time, one fused frame step per 80 ms codec frame, codec decode
included), compared against the reference's published H100 batch-1 RTF of
0.399 (BASELINE.md; reference README.md:74-79). vs_baseline =
baseline_rtf / our_rtf, so > 1.0 means faster than the reference.

Extra diagnostics (batch-8/32 per-stream RTF, frames/s/chip, codec tokens/s)
go to stderr.

Built to finish inside a tight driver budget on a remote-relay TPU backend
(round 1 timed out; see VERDICT):
  * weights are generated ON DEVICE in one jitted program (zero H2D upload;
    host-side init + per-tensor transfer cost ~95 s through the relay);
  * fuse+quantize run as one jitted program (engine.py), burst-layout
    construction is one jitted program (talker_burst_pallas.py) — eagerly
    these were dozens of per-op device round trips;
  * every program is persisted to the JAX compile cache (min_compile_time
    0) so repeat runs skip all XLA compiles — an *uncached* compile through
    the relay costs minutes, so bench.py must only ever compile programs
    this repo's round also compiled;
  * a global deadline (BENCH_DEADLINE_S, default 450 s) gates the optional
    legs (batch-8/32, codec): the primary JSON line is never sacrificed to
    a diagnostic.

Runs on whatever JAX platform the environment provides (the TPU chip under
the driver; CPU works for smoke runs via BENCH_SMOKE=1).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_RTF = 0.399  # reference engine, H100, 1.7B VoiceDesign, batch 1
FRAME_SECONDS = 0.08  # 12.5 Hz codec
T_START = time.time()
# 900 s: a fully WARM run (every program in the stable compile cache)
# completes in ~500-650 s through the bench relay — the old 450 s default
# squeezed the batch-32 throughput leg out of the driver record (the
# primary JSON line is printed long before this deadline and a SIGTERM
# handler salvages it regardless, so a tighter driver budget loses only
# diagnostics, never the metric).
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "900"))


def log(*a):
    print(f"[bench +{time.time()-T_START:5.0f}s]", *a, file=sys.stderr, flush=True)


def time_left() -> float:
    return DEADLINE_S - (time.time() - T_START)


def build_engine(smoke: bool):
    import jax
    import jax.numpy as jnp

    # Persistent compile cache with entry-point-stable keys: repeat bench
    # runs (and the driver run after this repo's own warming run) skip the
    # remote XLA compiles entirely. Crucially this also strips caller
    # frames from Mosaic kernel payloads — without that, the driver's own
    # invocation of this script from a different process/entry chain would
    # recompile every burst program cold (round-1 timeout root cause).
    from nano_qwen3tts_tpu.utils.compile_cache import (
        enable_stable_compile_cache,
    )

    enable_stable_compile_cache()

    from nano_qwen3tts_tpu.config import EngineConfig, preset_config
    from nano_qwen3tts_tpu.engine.engine import TTSEngine
    from nano_qwen3tts_tpu.models.weights import (
        init_predictor_params,
        init_talker_params,
    )

    cfg = preset_config("tiny" if smoke else "1.7b")
    tc = cfg.talker_config
    dtype = jnp.float32 if smoke else jnp.bfloat16
    # attention_impl "auto" selects the whole-stack Pallas talker burst
    # kernel when the layout allows (int8 weights+KV, one cache block per
    # lane -> block size == max_model_len): batch-8 frame 8.7 -> 2.8 ms on
    # v5e vs the per-layer paths. BENCH_ATTN=pallas/xla + a 128 block size
    # select the per-layer attention paths instead.
    attn = os.environ.get("BENCH_ATTN", "auto")
    # Default 64 (r5): the paned burst kernels ((L, n_panes) talker grid,
    # sequential 32-lane predictor pane calls) fit the 64-lane program in
    # the Mosaic compile budget that OOMed the flat r4 formulation, so the
    # batch-64 throughput tier is measurable — and on the driver record —
    # by default. BENCH_MAX_BATCH=32 restores the r4 shape.
    bmax = int(os.environ.get("BENCH_MAX_BATCH", "64"))
    streams = max(32, min(bmax, 128))
    buckets = (1, 2, 4, 8, 16, 32) + tuple(
        b for b in (64, 128) if b <= streams
    )
    ecfg = EngineConfig(
        max_model_len=1024,
        kvcache_block_size=128 if attn in ("pallas", "xla") else 1024,
        attention_impl=attn,
        max_active_streams=streams,
        decode_buckets=buckets,
        # 64 leads: the bench's 64-token prompts prefill unpadded (a 128
        # bucket pads them 2x — measured ~80 ms off first-chunk p50 at 8
        # simultaneous arrivals; the reference warms prefill graphs for
        # every size 1..256 for the same reason)
        prefill_buckets=(64, 128, 256, 512, 1024),
        # 8 frames per dispatch measured best on v5e through the bench relay
        # (4: 7.1 ms/frame, 8: 3.6, 16: 4.7 at batch 8) — amortizes the
        # per-dispatch host round trip; server keeps 4 (chunk granularity).
        frames_per_step=int(os.environ.get("BENCH_FRAMES_PER_STEP", "8")),
        unroll_layers=os.environ.get("BENCH_UNROLL", "1") == "1",
        # int8 weights + int8 paged KV are the production serving config
        # (north-star: "INT8/FP8 weights + INT8 paged KV"); both measured
        # faster than bf16 on v5e (weights: HBM-bound decode, KV: extend
        # kernel reads). BENCH_INT8=0 / BENCH_KV=bf16 select the bf16 paths.
        quantization=None if os.environ.get("BENCH_INT8") == "0" else "int8",
        kv_cache_dtype=os.environ.get("BENCH_KV", "int8"),
        # 8 simultaneous arrivals prefill in ONE (8, 128) dispatch instead
        # of 4 sequential (2, 128) ones — first-chunk p50 at 8 CCU dropped
        # ~3x (VERDICT r3 next #5); the (8, tb) program is in the warmed set.
        max_prefill_batch=8,
        # depth-2 keeps two dispatches in flight: the host fetch of step k
        # overlaps dispatch k+1 AND execution of k+2 — hides the full
        # round trip of the bench relay (the server uses depth 1 to keep
        # first-chunk latency minimal).
        pipeline_depth=int(os.environ.get("BENCH_PIPELINE_DEPTH", "2")),
    )

    t0 = time.time()
    # ONE jitted init program: weights are random-generated on device —
    # nothing but the program hash crosses the relay.
    pc = tc.code_predictor_config

    @jax.jit
    def _device_init():
        tp = init_talker_params(
            tc, jax.random.PRNGKey(0), dtype=dtype, include_text=False
        )
        pp = init_predictor_params(pc, jax.random.PRNGKey(1), dtype=dtype)
        return tp, pp

    tparams, pparams = jax.block_until_ready(_device_init())
    log(f"device weight init {time.time()-t0:.1f}s")
    # host-side pad vector (device fetch through the bench tunnel costs
    # minutes; content is irrelevant for random-weight throughput runs)
    pad = np.zeros(tc.hidden_size, np.float32)
    t0 = time.time()
    engine = TTSEngine(
        ecfg, cfg, tparams, pparams, tts_pad_embed=pad,
        # one KV block per lane + the garbage block: the auto-sizer can
        # land exactly at 64 and starve the 64-lane probe
        num_kvcache_blocks=streams + 1 if streams > 32 else None,
    )
    log(f"engine built {time.time()-t0:.1f}s "
        f"(platform={jax.devices()[0].platform}, blocks={engine.runner.num_blocks}, "
        f"attn={engine.runner.attn_impl}, predictor={engine.runner.predictor_impl})")
    return engine, tc


def run_stream(engine, tc, batch: int, n_frames: int, prompt_len: int = 64):
    """Run `batch` concurrent streams for n_frames frames; return seconds
    per *frame* per stream at steady state."""
    rng = np.random.default_rng(0)
    for b in range(batch):
        engine.add_request(
            (rng.standard_normal((prompt_len, tc.hidden_size)) * 0.3).astype(
                np.float32
            ),
            (rng.standard_normal((16, tc.hidden_size)) * 0.3).astype(np.float32),
            max_frames=n_frames,
            ignore_eos=True,
        )
    engine.step()  # prefill (excluded from steady-state timing)
    engine.step()  # settle into the decode bucket
    # median per-step time: robust to transient multi-second stalls of the
    # benching host<->device relay (observed; not a property of the engine)
    step_times = []
    frames_per_step = []
    empty = 0
    while engine.has_work():
        t0 = time.time()
        res = engine.step()
        if not res:
            # pipeline filling returns empty results; a long run of empties
            # with work outstanding would be a bug -> bail out
            empty += 1
            if empty > 4 + 2 * engine.cfg.pipeline_depth:
                break
            continue
        empty = 0
        step_times.append(time.time() - t0)
        frames_per_step.append(sum(1 for _, f, _ in res if isinstance(f, list)))
    if not step_times:
        return float("inf")
    # per-stream seconds per frame = median of (step time / frames-per-stream)
    per_stream = float(
        np.median([t / (f / batch) for t, f in zip(step_times, frames_per_step) if f])
    )
    return per_stream


def bench_codec(smoke: bool) -> dict:
    """Serving-path codec window decode cost (VERDICT r3 weak #1 fix).

    Measures the path the server actually runs — ``dispatch_pcm16``
    (bucket + pad: inner windows T=12 -> bucket 13, first chunks T=4 ->
    bucket 5; the server's DecodeWorker micro-batches concurrent windows,
    hence the B=8 legs) — and reports the MEDIAN per-window cycle over a
    depth-4 dispatch pipeline.

    r3's leg timed a raw unbucketed (1,16,16) dispatch with a single-run
    MEAN; one transient multi-second relay stall (the exact reason
    run_stream uses median step times) landed 69.2 ms/window on the driver
    record vs the ~7 ms the device actually takes. Reconciled with
    tools/codec_probe.py (2026-08-21, v5e, f32): serving window (1,16,12
    -> bucket 13) is 3.9 ms device-only / 6.4 ms full dispatch+fetch
    cycle, and r3's exact raw-(1,16,16) loop re-measures at 7.1 ms — the
    69.2 was a stall artifact, not a compute cost."""
    from collections import deque

    from nano_qwen3tts_tpu.audio.codec import CodecConfig, SpeechTokenizer

    cdt = os.environ.get("CODEC_COMPUTE_DTYPE", "float32")
    codec = SpeechTokenizer(
        CodecConfig(compute_dtype=cdt) if not smoke
        else CodecConfig.tiny(compute_dtype=cdt)
    )
    rng = np.random.default_rng(0)
    nb = codec.cfg.num_codebooks
    out = {}
    # (leg, batch, window frames): batch-1 inner window is the primary-RTF
    # fold; the B=8 legs are the 8-CCU serving shapes (first chunk T=4,
    # inner chunk T=12 = chunk 4 + left context 8).
    for name, B, T in (("b1_inner", 1, 12), ("b8_inner", 8, 12),
                       ("b8_first", 8, 4)):
        if time_left() < 30:
            log(f"codec leg {name} skipped: {time_left():.0f}s left")
            break
        codes = rng.integers(0, codec.cfg.codebook_size, size=(B, nb, T),
                             dtype=np.int64)
        dev, _ = codec.dispatch_pcm16(codes)  # compile / cache-load
        np.asarray(dev)
        depth, reps = 4, 16
        pend = deque()
        for _ in range(depth):
            d, _ = codec.dispatch_pcm16(codes)
            pend.append(d)
        cyc = []
        for _ in range(reps):
            t0 = time.time()
            d, _ = codec.dispatch_pcm16(codes)
            pend.append(d)
            np.asarray(pend.popleft())
            cyc.append(time.time() - t0)
        while pend:
            np.asarray(pend.popleft())
        out[name] = float(np.median(cyc))
        log(f"codec {name}: B={B} T={T}->bucket {codec._bucket(T)}: "
            f"{out[name]*1e3:.1f} ms/window (median dispatch+fetch cycle)")
    return out


def bench_first_chunk(engine, tc, ccu: int = 8, chunk_frames: int = 4,
                      codec_s: float = 0.0):
    """p50 submit->first-PCM-chunk latency at `ccu` concurrent arrivals
    (north-star metric; reference README.md:94-103 measures the same thing
    over HTTP). Engine-level: prefill + enough decode dispatches for the
    server's 4-code first chunk, plus the measured codec window decode
    time (codec_s) for the chunk itself. Programs must already be warm."""
    rng = np.random.default_rng(7)
    t_submit, t_first, got = {}, {}, {}
    for _ in range(ccu):
        rid = engine.add_request(
            (rng.standard_normal((64, tc.hidden_size)) * 0.3).astype(np.float32),
            (rng.standard_normal((16, tc.hidden_size)) * 0.3).astype(np.float32),
            max_frames=chunk_frames + engine.cfg.frames_per_step,
            ignore_eos=True,
        )
        t_submit[rid] = time.time()
        got[rid] = 0
    guard = 0
    while engine.has_work() and len(t_first) < ccu:
        for rid, frame, _fin in engine.step():
            if isinstance(frame, list):
                got[rid] = got.get(rid, 0) + 1
                if got[rid] >= chunk_frames and rid not in t_first:
                    t_first[rid] = time.time()
        guard += 1
        if guard > 200:
            break
    while engine.has_work():  # drain remaining frames
        engine.step()
        guard += 1
        if guard > 400:
            break
    lat = sorted(t_first[r] - t_submit[r] for r in t_first)
    if not lat:
        return None
    return float(np.median(lat)) + codec_s


_RESULT: dict = {}
_PRINTED = [False]
_DEC_S = [0.0]  # measured codec window decode seconds (first-chunk leg)


def emit_result():
    if _RESULT and not _PRINTED[0]:
        _PRINTED[0] = True
        print(json.dumps(_RESULT), flush=True)


def _on_term(signum, frame):  # driver timeout: salvage the primary metric
    log(f"signal {signum}: emitting result and exiting")
    emit_result()
    os._exit(0 if _PRINTED[0] else 124)


def main():
    import signal

    signal.signal(signal.SIGTERM, _on_term)
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    if smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")  # tiny smoke run off-chip
    engine, tc = build_engine(smoke)

    n_frames = 16 if smoke else 64
    # ADVICE r1: clamp the diagnostic batch to what the engine can actually
    # run concurrently and to a warmed decode bucket. Default 32 (VERDICT
    # r3 next #1): the measured throughput optimum is batch 32 and the
    # stable compile cache (utils/compile_cache.py) keeps its programs
    # warm, so the driver-visible record carries the real number. A COLD
    # batch-32 burst compile takes >10 min through the relay and blocks
    # SIGTERM delivery, so the leg stays behind the deadline gate below and
    # the primary JSON line is printed before it can start.
    bmax = int(os.environ.get("BENCH_MAX_BATCH", "4" if smoke else "64"))
    bmax = min(bmax, engine.cfg.max_active_streams, engine.cfg.decode_buckets[-1])
    tb = engine.cfg.prefill_buckets[0]
    pb = engine.cfg.max_prefill_batch

    # Staged warmup: compile ONLY what the next measurement dispatches, and
    # measure the primary metric before warming anything else — a cold
    # compile through the relay costs minutes, and the primary JSON line is
    # never hostage to a diagnostic leg's compile.
    t0 = time.time()
    engine.runner.warmup(decode_buckets=(1,), prefill_shapes=[(1, tb)])
    log(f"warmup(batch-1 programs) {time.time()-t0:.1f}s")

    # batch 1 (the primary metric)
    step_s_1 = run_stream(engine, tc, 1, n_frames)
    rtf_1 = step_s_1 / FRAME_SECONDS
    log(f"batch=1: {step_s_1*1e3:.1f} ms/frame, RTF={rtf_1:.3f}")
    _RESULT.update({
        "metric": "rtf_1p7b_batch1_streaming",
        "value": round(rtf_1, 4),
        "unit": "rtf (generation_time / audio_time; lower is better)",
        "vs_baseline": round(BASELINE_RTF / rtf_1, 3),
    })

    # codec decode (windowed streaming decode): part of the serving path,
    # folded into the primary RTF — run it before the batch diagnostics.
    try:
        if time_left() < 45:
            raise TimeoutError(f"codec leg skipped: {time_left():.0f}s left")
        dec = bench_codec(smoke)
        if "b1_inner" in dec:
            # batch-1 streaming: one 12-frame inner window decoded per 12
            # generated frames, on the critical path
            rtf_total = rtf_1 + dec["b1_inner"] / (12 * FRAME_SECONDS)
            _RESULT["value"] = round(rtf_total, 4)
            _RESULT["vs_baseline"] = round(BASELINE_RTF / rtf_total, 3)
        # 8 simultaneous first chunks decode as ONE micro-batched window
        # (the server's DecodeWorker); that cycle is each stream's codec
        # share of first-chunk latency
        _DEC_S[0] = dec.get("b8_first", dec.get("b1_inner", 0.0))
    except TimeoutError as e:
        log(str(e))
    except Exception as e:
        log(f"codec bench skipped: {e}")

    # The primary metric is final here — print it NOW. The remaining legs
    # are stderr diagnostics, and a driver SIGTERM that lands while a
    # diagnostic leg is inside a C-level XLA compile cannot be handled
    # until the compile returns (a follow-up SIGKILL would lose the JSON
    # line entirely if we waited).
    emit_result()

    try:
        # batch 8 (north-star diagnostic: 8 CCU < real time)
        if smoke:
            raise TimeoutError("skipping batch-8 leg: smoke run")
        if time_left() < 60:
            raise TimeoutError(
                f"skipping batch-8 leg: {time_left():.0f}s left < 60"
            )
        t0 = time.time()
        engine.runner.warmup(decode_buckets=(8,), prefill_shapes=[(pb, tb)])
        warm8_s = time.time() - t0

        # first-chunk p50 at 8 CCU (north-star metric; VERDICT r2 next #9):
        # 8 simultaneous arrivals through the just-warmed prefill + decode
        # programs; the server's 4-code first chunk + the measured codec
        # window decode. Cheap (a few dispatches) — run it BEFORE the
        # 64-frame batch-8 stream so a tight deadline cannot squeeze it out.
        fc = bench_first_chunk(engine, tc, ccu=8, codec_s=_DEC_S[0])
        if fc is not None:
            print(json.dumps({
                "metric": "first_chunk_p50_8ccu_ms",
                "value": round(fc * 1e3, 1),
                "unit": "ms (submit -> 4-frame first PCM chunk, 8 "
                        "simultaneous arrivals, codec decode included)",
            }), file=sys.stderr, flush=True)

        step_s_8 = run_stream(engine, tc, 8, n_frames)
        rtf_8 = step_s_8 / FRAME_SECONDS
        frames_per_s = 8.0 / step_s_8
        log(
            f"batch=8: {step_s_8*1e3:.1f} ms/frame/step, per-stream "
            f"RTF={rtf_8:.3f}, {frames_per_s:.1f} frames/s/chip, "
            f"{frames_per_s*16:.0f} codec tokens/s/chip"
        )

        # batch bmax (throughput ceiling): the burst kernels' per-frame
        # weight stream is batch-independent, so per-stream cost keeps
        # dropping as lanes fill — the chip's codec-token throughput story.
        #
        # Budget gate (VERDICT r4 next #7): a CACHE-COLD bmax-lane burst
        # program is a ~20 min Mosaic compile through the relay — far past
        # any driver deadline, and once inside the C-level compile SIGTERM
        # can't be handled. The batch-8 warmup time is the measured
        # coldness signal: warm cache loads take seconds, cold compiles
        # minutes. Run the leg only if the remaining budget covers the
        # estimated compile (~90 s warm, 1500 s cold); otherwise print the
        # one-line skip reason — never a silent truncation.
        cold = warm8_s > 30
        for b in (32, 64):
            if b > bmax:
                continue
            need = 1500 if cold else 90
            if time_left() <= need:
                log(f"batch={b} leg skipped: {time_left():.0f}s left < "
                    f"{need}s needed (batch-8 warmup took {warm8_s:.0f}s -> "
                    f"cache {'COLD' if cold else 'warm'})")
                continue
            engine.runner.warmup(decode_buckets=(b,), prefill_shapes=[])
            step_s_b = run_stream(engine, tc, b, n_frames)
            fps_b = b / step_s_b
            log(
                f"batch={b}: {step_s_b*1e3:.1f} ms/frame/step, "
                f"per-stream RTF={step_s_b/FRAME_SECONDS:.3f}, "
                f"{fps_b:.1f} frames/s/chip, "
                f"{fps_b*16:.0f} codec tokens/s/chip"
            )
            print(json.dumps({
                "metric": f"codec_tokens_per_s_per_chip_batch{b}",
                "value": round(fps_b * 16),
                "unit": "codec tokens/s/chip (throughput tier)",
            }), file=sys.stderr, flush=True)
    except TimeoutError as e:
        log(str(e))
    except Exception as e:  # diagnostics only — never fail the bench
        log(f"diagnostic legs stopped: {e}")

    # Full-HTTP-stack serving leg (VERDICT r4 next #1: the serve_bench
    # numbers belong on the DRIVER-VISIBLE record, not just PARITY.md).
    # Runs examples/serve_bench.py as a subprocess — a second TPU-relay
    # client coexists with this one (verified) — with the pooled on-device
    # window decode serving path. Gated on remaining budget and on the
    # warm-cache signal; skips with a one-line reason otherwise.
    try:
        if smoke or os.environ.get("BENCH_SERVE", "1") == "0":
            raise TimeoutError("serving leg skipped: smoke/disabled")
        budget = time_left() - 45
        if budget < 360:
            raise TimeoutError(
                f"serving leg skipped: {time_left():.0f}s left < 405"
            )
        import subprocess

        log("serving leg: examples/serve_bench.py --ccu 8,16,32 (HTTP stack)")
        p = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "examples", "serve_bench.py"),
             "--ccu", "8,16,32", "--frames", "120", "--port", "17911"],
            capture_output=True, text=True, timeout=budget,
        )
        rows = []
        for line in p.stdout.splitlines():
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
        if not rows:
            tail = (p.stderr or "")[-300:].replace("\n", " | ")
            log(f"serving leg produced no rows (rc={p.returncode}): {tail}")
        for row in rows:
            print(json.dumps({
                "metric": f"serving_rtf_p50_{row['ccu']}ccu",
                "value": row["rtf_p50"],
                "unit": "per-stream RTF p50 through the full HTTP serving "
                        "stack (streaming chunks, pooled on-device window "
                        "decode)",
                "first_chunk_p50_ms": row["first_chunk_p50_ms"],
                "inner_chunk_p50_ms": row["inner_chunk_p50_ms"],
            }), file=sys.stderr, flush=True)
    except TimeoutError as e:
        log(str(e))
    except Exception as e:
        log(f"serving leg skipped: {e}")

    emit_result()
    log(f"done in {time.time()-T_START:.0f}s")


if __name__ == "__main__":
    main()
