"""VoiceDesign synthesis (parity: reference examples/voice_design_example.py):
natural-language instruction controls the voice."""

from common import base_parser, build_interface, maybe_force_cpu


def main():
    ap = base_parser("VoiceDesign example")
    ap.add_argument(
        "--instruct", default="Male, 30 years old, calm and professional."
    )
    args = ap.parse_args()
    maybe_force_cpu(args)
    iface = build_interface(args.model)
    frames = list(
        iface.generate_voice_design(
            args.text, args.instruct, args.language, max_frames=25
        )
    )
    print(f"{len(frames)} codec frames")
    wavs, sr = iface.codes_to_audio(frames)
    if args.out:
        from nano_qwen3tts_tpu.audio.wav import write_wav

        write_wav(args.out, wavs[0], sr)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
