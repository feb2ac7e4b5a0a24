"""N concurrent async streams through one engine (parity: reference
examples/batch_async_example.py): reports first-frame latency stats."""

import asyncio
import time

import numpy as np

from common import base_parser, build_interface, maybe_force_cpu


async def consume(iface, text, speaker, stats):
    t0 = time.time()
    first = None
    n = 0
    async for frame in iface.generate_custom_voice_async(text, "English", speaker):
        if first is None:
            first = time.time() - t0
        n += 1
        if n >= 16:
            break
    stats.append({"first_frame_ms": (first or 0) * 1e3, "frames": n,
                  "total_s": time.time() - t0})


async def main_async(args):
    iface = build_interface(args.model)
    await iface.start()
    stats = []
    t0 = time.time()
    await asyncio.gather(
        *(
            consume(iface, f"{args.text} (stream {i})", "Vivian", stats)
            for i in range(args.n)
        )
    )
    wall = time.time() - t0
    await iface.stop()
    ff = [s["first_frame_ms"] for s in stats]
    print(f"{args.n} concurrent streams in {wall:.2f}s | first-frame "
          f"min={min(ff):.0f}ms avg={np.mean(ff):.0f}ms max={max(ff):.0f}ms")


def main():
    ap = base_parser("Concurrent async streams")
    ap.add_argument("-n", type=int, default=4)
    args = ap.parse_args()
    maybe_force_cpu(args)
    asyncio.run(main_async(args))


if __name__ == "__main__":
    main()
