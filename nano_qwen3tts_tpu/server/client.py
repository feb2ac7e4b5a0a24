"""Streaming client + load generator (parity: examples/client.py).

Reads the chunked PCM stream, measures first/inner-chunk latency, writes a
WAV; ``-j/-n`` run parallel requests for load testing.
"""

from __future__ import annotations

import argparse
import http.client
import json
import threading
import time

import numpy as np


def stream_speech(
    host: str, port: int, payload: dict, timeout: float = 120.0
) -> tuple[np.ndarray, dict]:
    """POST /v1/audio/speech, return (float waveform, latency stats)."""
    conn = http.client.HTTPConnection(host, port, timeout=timeout)
    body = json.dumps(payload)
    t0 = time.time()
    conn.request(
        "POST", "/v1/audio/speech", body, {"Content-Type": "application/json"}
    )
    resp = conn.getresponse()
    assert resp.status == 200, f"HTTP {resp.status}: {resp.read()[:200]}"
    chunks = []
    times = []
    while True:
        chunk = resp.read1(1 << 16)
        if not chunk:
            break
        chunks.append(chunk)
        times.append(time.time() - t0)
    conn.close()
    pcm = np.frombuffer(b"".join(chunks), dtype="<i2")
    wav = pcm.astype(np.float32) / 32768.0
    stats = {
        "first_chunk_ms": times[0] * 1e3 if times else None,
        "total_s": times[-1] if times else None,
        "audio_s": len(wav) / 24000.0,
        "rtf": (times[-1] / (len(wav) / 24000.0)) if len(wav) else None,
        "inner_chunk_ms": (
            float(np.mean(np.diff(times)) * 1e3) if len(times) > 1 else None
        ),
    }
    return wav, stats


def main():  # pragma: no cover
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--text", default="Hello from the TPU TTS engine.")
    ap.add_argument("--voice", default="Vivian")
    ap.add_argument("--language", default="English")
    ap.add_argument("--out", default="out.wav")
    ap.add_argument("-j", "--jobs", type=int, default=1, help="parallel requests")
    ap.add_argument("-n", "--num", type=int, default=1, help="requests per worker")
    args = ap.parse_args()

    payload = {"input": args.text, "voice": args.voice, "language": args.language}
    results = []
    lock = threading.Lock()

    def worker(wid):
        for i in range(args.num):
            wav, stats = stream_speech(args.host, args.port, payload)
            with lock:
                results.append(stats)
                print(f"[w{wid}#{i}] {stats}")
            if wid == 0 and i == 0 and args.out:
                from nano_qwen3tts_tpu.audio.wav import write_wav

                write_wav(args.out, wav, 24000)

    threads = [
        threading.Thread(target=worker, args=(w,)) for w in range(args.jobs)
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    fc = [r["first_chunk_ms"] for r in results if r["first_chunk_ms"]]
    rtf = [r["rtf"] for r in results if r["rtf"]]
    print(
        f"\n{len(results)} requests in {wall:.1f}s | first-chunk "
        f"p50={np.percentile(fc, 50):.0f}ms p95={np.percentile(fc, 95):.0f}ms | "
        f"RTF mean={np.mean(rtf):.3f}"
    )


if __name__ == "__main__":  # pragma: no cover
    main()
