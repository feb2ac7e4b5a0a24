"""VoiceClone synthesis (parity: reference examples/voice_clone_example.py):
build a clone prompt from reference audio (ICL or x-vector-only), then
synthesize in that voice."""

import numpy as np

from common import base_parser, build_interface, maybe_force_cpu


def main():
    ap = base_parser("VoiceClone example")
    ap.add_argument("--ref-audio", default=None, help="reference WAV path")
    ap.add_argument("--ref-text", default="This is the reference transcript.")
    ap.add_argument("--x-vector-only", action="store_true")
    args = ap.parse_args()
    maybe_force_cpu(args)
    iface = build_interface(args.model)

    if args.ref_audio:
        ref = args.ref_audio
    else:  # synthetic reference audio so the example runs without assets
        hop = iface.speech_tokenizer.cfg.hop
        rng = np.random.default_rng(0)
        ref = (rng.standard_normal(12 * hop).astype(np.float32) * 0.1, 24000)

    prompt = iface.create_voice_clone_prompt(
        ref, ref_text=args.ref_text, x_vector_only_mode=args.x_vector_only
    )
    print(
        "clone prompt:",
        {k: (v.shape if hasattr(v, "shape") else v) for k, v in prompt.items()},
    )
    frames = list(
        iface.generate_voice_clone(
            args.text, language=args.language, voice_clone_prompt=prompt,
            max_frames=25,
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
