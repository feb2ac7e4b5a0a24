"""Shared setup for the example scripts.

With a real checkpoint directory (``--model``), builds the full interface
from weights; without one, builds a seeded random-weight interface on the
tiny config so every example is runnable in this environment (there is no
public Qwen3-TTS checkpoint here — examples then demonstrate the API and
the serving machinery, not audio quality).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# allow running straight from the examples/ directory
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def stub_tokenizer(text: str):
    ids = [(3 + ord(c)) % 500 for c in text]
    return np.asarray([ids], np.int64)


def build_interface(model_path=None, preset="tiny", engine_kw=None):
    from nano_qwen3tts_tpu.interface import Qwen3TTSInterface

    if model_path:
        return Qwen3TTSInterface.from_pretrained(model_path)

    import jax
    import jax.numpy as jnp

    from nano_qwen3tts_tpu.audio.codec import CodecConfig, SpeechTokenizer
    from nano_qwen3tts_tpu.audio.speaker import SpeakerEncoder
    from nano_qwen3tts_tpu.config import (
        EngineConfig,
        SpeakerEncoderConfig,
        preset_config,
    )
    from nano_qwen3tts_tpu.models.weights import (
        host_random_init,
        init_predictor_params,
        init_talker_params,
    )

    cfg = preset_config(preset)
    cfg.tts_bos_token_id, cfg.tts_eos_token_id, cfg.tts_pad_token_id = 505, 506, 507
    cfg.talker_config.spk_id = {"vivian": 3000}
    cfg.talker_config.codec_language_id = {"english": 4100}
    tc = cfg.talker_config
    with host_random_init():
        tp = init_talker_params(tc, jax.random.PRNGKey(0), dtype=jnp.float32)
        pp = init_predictor_params(
            tc.code_predictor_config, jax.random.PRNGKey(1), dtype=jnp.float32
        )
    ecfg = EngineConfig(
        max_model_len=256, kvcache_block_size=16, max_num_batched_tokens=1024,
        max_active_streams=8, decode_buckets=(1, 2, 4, 8),
        prefill_buckets=(64, 128, 256), frames_per_step=4,
        **(engine_kw or {}),
    )
    codec = SpeechTokenizer(
        CodecConfig.tiny(compute_dtype=os.environ.get(
            "CODEC_COMPUTE_DTYPE", "bfloat16")),
        seed=0,
    )
    spk = SpeakerEncoder(
        SpeakerEncoderConfig(enc_dim=tc.hidden_size,
                             enc_channels=(32, 32, 32, 32, 96),
                             enc_attention_channels=16, enc_res2net_scale=4,
                             enc_se_channels=16),
        seed=0,
    )
    return Qwen3TTSInterface(
        engine_config=ecfg, model_config=cfg, talker_params=tp,
        predictor_params=pp, tokenizer=stub_tokenizer,
        speech_tokenizer=codec, speaker_encoder=spk,
    )


def base_parser(desc: str) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=desc)
    ap.add_argument("--model", default=None, help="checkpoint dir (optional)")
    ap.add_argument("--text", default="Hello from the TPU TTS engine.")
    ap.add_argument("--language", default="English")
    ap.add_argument("--out", default=None, help="output WAV path")
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (this image pre-registers the TPU "
        "platform; plain JAX_PLATFORMS=cpu is overridden)",
    )
    ap.add_argument(
        "--tp", type=int, default=1,
        help="tensor-parallel size: shard weights/KV over a device mesh",
    )
    ap.add_argument(
        "--dp", type=int, default=1,
        help="data-parallel size: shard the batch dim over the mesh",
    )
    ap.add_argument(
        "--virtual-devices", type=int, default=0,
        help="with --cpu: present N virtual CPU devices (to exercise "
        "--tp/--dp without TPU hardware)",
    )
    return ap


def maybe_force_cpu(args):
    n = getattr(args, "virtual_devices", 0)
    if n:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={n}"
            ).strip()
    if getattr(args, "cpu", False) or n:
        import jax

        jax.config.update("jax_platforms", "cpu")


def engine_kw_from_args(args) -> dict:
    kw = {}
    if getattr(args, "tp", 1) > 1:
        kw["tensor_parallel_size"] = args.tp
    if getattr(args, "dp", 1) > 1:
        kw["data_parallel_size"] = args.dp
    return kw
