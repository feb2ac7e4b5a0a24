"""CustomVoice synthesis (parity: reference interface __main__ +
examples usage): prompt -> codec frames -> WAV."""

from common import base_parser, build_interface, maybe_force_cpu


def main():
    ap = base_parser("CustomVoice example")
    ap.add_argument("--speaker", default="Vivian")
    args = ap.parse_args()
    maybe_force_cpu(args)
    iface = build_interface(args.model)
    frames = list(
        iface.generate_custom_voice(
            args.text, args.language, args.speaker, max_frames=25
        )
    )
    print(f"{len(frames)} codec frames ({len(frames) * 0.08:.2f}s of audio)")
    wavs, sr = iface.codes_to_audio(frames)
    if args.out:
        from nano_qwen3tts_tpu.audio.wav import write_wav

        write_wav(args.out, wavs[0], sr)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
