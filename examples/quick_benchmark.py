"""Quick RTF benchmark (parity: reference examples/quick_benchmark.py).

Measures generation time and RTF for a VoiceDesign-style request on the
current backend. For the full driver benchmark (1.7B on TPU, JSON line) see
bench.py at the repo root.
"""

import time

from common import base_parser, build_interface, maybe_force_cpu


def main():
    ap = base_parser("Quick RTF benchmark")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--frames", type=int, default=50)
    args = ap.parse_args()
    maybe_force_cpu(args)
    iface = build_interface(args.model)

    # warmup (compiles the serving buckets — reference does a warmup ramp)
    list(iface.generate_voice_design("warm up", "calm voice", max_frames=4))

    times = []
    for i in range(args.runs):
        t0 = time.time()
        frames = list(
            iface.generate_voice_design(
                args.text, "Male, calm, professional", args.language,
                max_frames=args.frames,
            )
        )
        dt = time.time() - t0
        audio_s = len(frames) * 0.08
        times.append((dt, audio_s))
        print(f"run {i}: {dt:.3f}s for {audio_s:.2f}s audio "
              f"(RTF {dt / max(audio_s, 1e-9):.3f})")
    avg_t = sum(t for t, _ in times) / len(times)
    avg_a = sum(a for _, a in times) / len(times)
    print(f"avg generation {avg_t:.3f}s, RTF {avg_t / max(avg_a, 1e-9):.3f}")


if __name__ == "__main__":
    main()
