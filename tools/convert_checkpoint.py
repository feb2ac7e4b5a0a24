"""Convert external Qwen3-TTS checkpoints into this repo's formats.

The serving engine loads four weight families:

  model.safetensors       talker + code-predictor transformers (loaded
                          directly — reference key layout, models/weights.py)
  codec.safetensors       neural codec (SpeechTokenizer): decoder tensors
                          under the UPSTREAM torch Code2Wav names/layouts
                          (audio/code2wav.torch_name_map — pinned against
                          the real torch module in
                          tests/test_code2wav_parity.py) + ``encoder.*``
                          tensors in this repo's dotted schema (the
                          upstream encoder has no public implementation —
                          CODEC_ARCH.md)
  speaker.safetensors     ECAPA-TDNN speaker encoder, FLAT dotted-key schema
                          = flatten of audio.speaker.init_speaker_encoder_params

The talker/predictor need no conversion. This tool produces the other two
from external checkpoints:

  python tools/convert_checkpoint.py speaker --src /path/model.safetensors \\
      --out /path/speaker.safetensors [--rename-map map.json]
  python tools/convert_checkpoint.py codec --src /path/codec_ckpt.safetensors \\
      --out /path/codec.safetensors [--rename-map map.json]
  python tools/convert_checkpoint.py print-schema [speaker|codec]

Upstream tensor names come from the external ``qwen_tts`` package (the
reference loads the speaker encoder out of the full HF model,
interface.py:442-470, and the codec from its own checkpoint — neither
package nor checkpoint exists in this environment). The conversion
therefore works in two steps:

  1. strip a known prefix (``speaker_encoder.`` / ``talker.speaker_encoder.``)
     and apply the optional ``--rename-map`` (JSON ``{regex: replacement}``,
     applied in order) to bring names into this repo's flat schema;
  2. validate STRICTLY against the schema: any missing or unexpected tensor
     name, or any shape mismatch, aborts with the full diff — a conversion
     either matches the documented schema exactly or fails loudly.

``print-schema`` emits the exact expected names+shapes so a mapping for a
new upstream layout can be authored without reading source.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def _load_flat(path: str, prefixes=()) -> dict:
    from safetensors import safe_open

    flat = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            name = k
            for p in prefixes:
                if k.startswith(p):
                    name = k[len(p):]
                    break
            else:
                if prefixes:  # prefix filtering requested and none matched
                    continue
            try:
                flat[name] = f.get_tensor(k)
            except (TypeError, ValueError):
                # bf16 via torch (numpy has no bf16)
                import torch
                from safetensors.torch import load_file

                t = load_file(path)[k]
                flat[name] = t.to(torch.float32).numpy()
    return flat


def _apply_rename(flat: dict, rename_map_path: str | None) -> dict:
    if not rename_map_path:
        return flat
    with open(rename_map_path) as f:
        rules = json.load(f)
    out = {}
    for k, v in flat.items():
        name = k
        for pat, repl in rules.items():
            name = re.sub(pat, repl, name)
        out[name] = v
    return out


def speaker_schema(cfg=None):
    import jax

    from nano_qwen3tts_tpu.audio.speaker import (
        flatten_speaker_params,
        init_speaker_encoder_params,
    )
    from nano_qwen3tts_tpu.config import SpeakerEncoderConfig

    cfg = cfg or SpeakerEncoderConfig()
    return flatten_speaker_params(
        init_speaker_encoder_params(cfg, jax.random.PRNGKey(0))
    )


def codec_schema(cfg=None):
    import jax

    from nano_qwen3tts_tpu.audio.codec import (
        CodecConfig,
        flatten_codec_params,
        init_codec_params,
    )

    cfg = cfg or CodecConfig()
    return flatten_codec_params(
        init_codec_params(cfg, jax.random.PRNGKey(0)), cfg
    )


def convert(kind: str, src: str, out: str, rename_map: str | None):
    import numpy as np
    from safetensors.numpy import save_file

    if kind == "speaker":
        flat = _load_flat(
            src, prefixes=("speaker_encoder.", "talker.speaker_encoder.")
        ) or _load_flat(src)
        schema = speaker_schema()
    else:
        flat = _load_flat(src)
        schema = codec_schema()
    flat = _apply_rename(flat, rename_map)

    if kind == "codec" and set(schema) - set(flat):
        # The reference's speech tokenizer exposes the code-to-wav module as
        # ``tokenizer.model.decoder`` (the CUDA-graph wrapper feeds it raw
        # [B,16,T] codes — reference speech_tokenizer_cudagraph.py:23,108),
        # so a full-tokenizer checkpoint likely nests our schema under one
        # of these prefixes. Try them whole-file and keep the first that
        # validates better (never mixing prefixes within one file).
        for pref in ("decoder.", "model.decoder.", "tokenizer.model.decoder."):
            cand = {
                k[len(pref):]: v for k, v in flat.items() if k.startswith(pref)
            }
            if not set(schema) - set(cand):
                print(f"note: matched schema under prefix {pref!r}")
                flat = cand
                break

    missing = sorted(set(schema) - set(flat))
    unexpected = sorted(set(flat) - set(schema))
    if missing or unexpected:
        print(f"ERROR: {kind} conversion does not match the schema.", file=sys.stderr)
        for name in missing:
            print(f"  missing    {name}  {schema[name].shape}", file=sys.stderr)
        for name in unexpected:
            print(f"  unexpected {name}  {np.asarray(flat[name]).shape}", file=sys.stderr)
        print(
            "Author a --rename-map (JSON {regex: replacement}) mapping the "
            "upstream names onto the schema; `print-schema` lists every "
            "expected tensor.", file=sys.stderr,
        )
        sys.exit(2)
    bad = [
        (k, np.asarray(flat[k]).shape, schema[k].shape)
        for k in schema
        if tuple(np.asarray(flat[k]).shape) != tuple(schema[k].shape)
    ]
    if bad:
        print(f"ERROR: {kind} shape mismatches:", file=sys.stderr)
        for k, got, want in bad:
            print(f"  {k}: {got} != expected {want}", file=sys.stderr)
        sys.exit(2)
    save_file({k: np.asarray(v, np.float32) for k, v in flat.items()}, out)
    print(f"wrote {out}: {len(flat)} tensors")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    for kind in ("speaker", "codec"):
        s = sub.add_parser(kind)
        s.add_argument("--src", required=True)
        s.add_argument("--out", required=True)
        s.add_argument("--rename-map", default=None)
    s = sub.add_parser("print-schema")
    s.add_argument("kind", choices=["speaker", "codec"])
    args = ap.parse_args(argv)
    if args.cmd == "print-schema":
        schema = speaker_schema() if args.kind == "speaker" else codec_schema()
        for k in sorted(schema):
            print(f"{k}\t{tuple(schema[k].shape)}")
        return
    convert(args.cmd, args.src, args.out, args.rename_map)


if __name__ == "__main__":
    main()
