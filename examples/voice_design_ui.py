"""Voice-design web UI launcher (parity: reference
examples/gradio_voice_design.py). Starts the serving stack and opens the
browser-based voice-design page at http://<host>:<port>/ui — same flow as
the reference's Gradio app (text + instruction + language -> audio), but
streaming PCM live instead of waiting for the full waveform.

    python voice_design_ui.py --model /path/to/checkpoint --port 17861
    python voice_design_ui.py            # random tiny weights, API demo
"""

import asyncio
import logging

from common import base_parser, build_interface, engine_kw_from_args, maybe_force_cpu


def main():
    ap = base_parser("Voice-design web UI")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=17861)
    ap.add_argument("--voices-dir", default=None)
    args = ap.parse_args()
    maybe_force_cpu(args)
    logging.basicConfig(level=logging.INFO)

    from nano_qwen3tts_tpu.server.app import TTSServer

    # --tp/--dp serve over a device mesh (--cpu --virtual-devices 8 --tp 4
    # --dp 2 demonstrates it without TPU hardware)
    iface = build_interface(args.model, engine_kw=engine_kw_from_args(args))
    server = TTSServer(iface, voices_dir=args.voices_dir)
    print(f"Voice-design UI: http://localhost:{args.port}/ui")
    asyncio.run(server.serve_forever(args.host, args.port))


if __name__ == "__main__":
    main()
