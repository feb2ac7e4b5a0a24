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


def _schema_diff_abort(kind, missing, unexpected, schema, flat):
    import numpy as np

    print(f"ERROR: {kind} conversion does not match the schema.", file=sys.stderr)
    for name in missing:
        print(f"  missing    {name}  {schema[name].shape}", file=sys.stderr)
    for name in unexpected:
        print(f"  unexpected {name}  {np.asarray(flat[name]).shape}",
              file=sys.stderr)
    print(
        "Author a --rename-map (JSON {regex: replacement}) mapping the "
        "upstream names onto the schema; `print-schema` lists every "
        "expected tensor.", file=sys.stderr,
    )
    sys.exit(2)


def _check_shapes(kind, schema, flat):
    import numpy as np

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


def _encoder_delta_report(leftovers: dict, enc_schema: dict):
    """Classify unconverted source tensors against the encoder CONTRACT
    invariants the decoder pins down (CODEC_ARCH.md, encoder dossier):
    16 residual codebooks x 2048 entries, 12.5 Hz / 1920-sample hop at
    24 kHz, codes in the same id space as the decoder's code_embedding."""
    import numpy as np

    print(
        f"encoder delta: source has {len(leftovers)} tensors that are not "
        f"in the decoder schema; this repo's ASSUMED encoder schema has "
        f"{len(enc_schema)} tensors (print-schema codec | grep encoder).",
        file=sys.stderr,
    )
    for name in sorted(leftovers):
        shape = tuple(np.asarray(leftovers[name]).shape)
        tags = []
        if shape[:2] == (16, 2048) and len(shape) == 3:
            tags.append("<- 16-book x 2048-entry RVQ codebook bank "
                        "(matches the decode contract NQ=16, V=2048)")
        elif len(shape) == 2 and shape[0] == 2048:
            tags.append("<- single 2048-entry codebook stage")
        if any(h in name.lower() for h in
               ("codebook", "quantizer", "vq", "encoder", "embed")):
            tags.append("[encoder-ish name]")
        print(f"  {name}  {shape}  {' '.join(tags)}", file=sys.stderr)
    print(
        "The upstream Qwen3-TTS codec ENCODER has no public implementation "
        "(CODEC_ARCH.md encoder dossier documents exactly which encoder "
        "facts the decode contract pins down and which remain unknown). "
        "Options: --encoder skip writes a decoder-only codec.safetensors "
        "(everything except encode-from-raw-audio works; "
        "SpeechTokenizer.encode then fails loudly); or author a "
        "--rename-map onto the assumed schema if the architecture matches.",
        file=sys.stderr,
    )


def _convert_codec(src: str, out: str, rename_map: str | None,
                   encoder_mode: str):
    import numpy as np
    from safetensors.numpy import save_file

    flat_all = _apply_rename(_load_flat(src), rename_map)
    schema = codec_schema()
    dec_schema = {k: v for k, v in schema.items()
                  if not k.startswith("encoder.")}
    enc_schema = {k: v for k, v in schema.items() if k.startswith("encoder.")}
    flat = flat_all
    if set(dec_schema) - set(flat):
        # The reference's speech tokenizer exposes the code-to-wav module as
        # ``tokenizer.model.decoder`` (the CUDA-graph wrapper feeds it raw
        # [B,16,T] codes — reference speech_tokenizer_cudagraph.py:23,108),
        # so a full-tokenizer checkpoint likely nests the decoder under one
        # of these prefixes. Non-prefixed tensors are kept for the encoder
        # scan below.
        for pref in ("decoder.", "model.decoder.", "tokenizer.model.decoder."):
            cand = {
                k[len(pref):]: v for k, v in flat_all.items()
                if k.startswith(pref)
            }
            if not set(dec_schema) - set(cand):
                print(f"note: matched decoder schema under prefix {pref!r}")
                flat = {
                    k: v for k, v in flat_all.items()
                    if not k.startswith(pref)
                }
                flat.update(cand)
                break
    missing = sorted(set(dec_schema) - set(flat))
    if missing:
        _schema_diff_abort("codec decoder", missing, [], dec_schema, flat)
    _check_shapes("codec decoder", dec_schema, flat)
    out_tensors = {k: flat[k] for k in dec_schema}

    leftovers = {
        k: v for k, v in flat.items()
        if k not in dec_schema and k not in enc_schema
    }
    have_enc = not (set(enc_schema) - set(flat))
    if have_enc:
        _check_shapes("codec encoder", enc_schema, flat)
        out_tensors.update({k: flat[k] for k in enc_schema})
        if leftovers:
            _schema_diff_abort("codec", [], sorted(leftovers), schema, flat)
    elif leftovers:
        # Encoder-ish tensors exist but cannot be mapped onto the assumed
        # schema — fail on the DOCUMENTED delta (VERDICT r3 next #7) unless
        # the caller explicitly drops them.
        _encoder_delta_report(leftovers, enc_schema)
        if encoder_mode == "strict" or encoder_mode == "delta":
            sys.exit(2)
        print(f"note: --encoder skip: dropping {len(leftovers)} "
              "unconvertible encoder tensors (decoder-only output)")
    elif encoder_mode == "strict":
        print("ERROR: --encoder strict but the source has no encoder "
              "tensors at all.", file=sys.stderr)
        sys.exit(2)
    else:
        print("note: source is decoder-only; writing decoder-only "
              "codec.safetensors (encode-from-raw-audio will fail loudly; "
              "voice clone from precomputed codes unaffected)")
    save_file({k: np.asarray(v, np.float32) for k, v in out_tensors.items()},
              out)
    print(f"wrote {out}: {len(out_tensors)} tensors"
          + ("" if have_enc else " (decoder-only)"))


def convert(kind: str, src: str, out: str, rename_map: str | None,
            encoder_mode: str = "delta"):
    import numpy as np
    from safetensors.numpy import save_file

    if kind == "codec":
        _convert_codec(src, out, rename_map, encoder_mode)
        return
    flat = _load_flat(
        src, prefixes=("speaker_encoder.", "talker.speaker_encoder.")
    ) or _load_flat(src)
    schema = speaker_schema()
    flat = _apply_rename(flat, rename_map)
    missing = sorted(set(schema) - set(flat))
    unexpected = sorted(set(flat) - set(schema))
    if missing or unexpected:
        _schema_diff_abort(kind, missing, unexpected, schema, flat)
    _check_shapes(kind, schema, flat)
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
        if kind == "codec":
            s.add_argument(
                "--encoder", default="delta",
                choices=["delta", "skip", "strict"],
                help="encoder tensors: 'delta' (default) converts them when "
                     "they match the assumed schema, else fails printing the "
                     "documented delta; 'skip' writes decoder-only; "
                     "'strict' requires a full encoder match",
            )
    s = sub.add_parser("print-schema")
    s.add_argument("kind", choices=["speaker", "codec"])
    args = ap.parse_args(argv)
    if args.cmd == "print-schema":
        schema = speaker_schema() if args.kind == "speaker" else codec_schema()
        for k in sorted(schema):
            print(f"{k}\t{tuple(schema[k].shape)}")
        return
    convert(args.cmd, args.src, args.out, args.rename_map,
            getattr(args, "encoder", "delta"))


if __name__ == "__main__":
    main()
