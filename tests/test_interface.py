"""End-to-end interface tests: three product modes on the tiny config."""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_qwen3tts_tpu.audio.codec import CodecConfig, SpeechTokenizer
from nano_qwen3tts_tpu.audio.speaker import SpeakerEncoder
from nano_qwen3tts_tpu.config import (
    EngineConfig,
    SpeakerEncoderConfig,
    preset_config,
)
from nano_qwen3tts_tpu.interface import Qwen3TTSInterface
from nano_qwen3tts_tpu.models.weights import init_predictor_params, init_talker_params


def stub_tokenizer(text: str) -> np.ndarray:
    ids = [(3 + ord(c)) % 500 for c in text]
    return np.asarray([ids], np.int64)


@pytest.fixture(scope="module")
def iface():
    cfg = preset_config("tiny")
    cfg.tts_bos_token_id, cfg.tts_eos_token_id, cfg.tts_pad_token_id = 505, 506, 507
    cfg.talker_config.spk_id = {"vivian": 3000}
    cfg.talker_config.codec_language_id = {"english": 4100}
    tc = cfg.talker_config
    tp = init_talker_params(tc, jax.random.PRNGKey(0), dtype=jnp.float32)
    pp = init_predictor_params(
        tc.code_predictor_config, jax.random.PRNGKey(1), dtype=jnp.float32
    )
    ecfg = EngineConfig(
        max_model_len=256, kvcache_block_size=16, max_num_batched_tokens=1024,
        max_active_streams=4, decode_buckets=(1, 2, 4), prefill_buckets=(64, 128, 256),
    )
    codec = SpeechTokenizer(
        CodecConfig(
            num_codebooks=16, codebook_size=64, latent_dim=32, base_channels=8,
            upsample_rates=(4, 5, 4, 4),
        ),
        seed=0,
    )
    spk = SpeakerEncoder(
        SpeakerEncoderConfig(
            enc_dim=tc.hidden_size, enc_channels=(32, 32, 32, 32, 96),
            enc_attention_channels=16, enc_res2net_scale=4, enc_se_channels=16,
        ),
        seed=0,
    )
    return Qwen3TTSInterface(
        engine_config=ecfg, model_config=cfg, talker_params=tp,
        predictor_params=pp, tokenizer=stub_tokenizer,
        speech_tokenizer=codec, speaker_encoder=spk,
    )


def test_custom_voice_sync(iface):
    frames = list(
        iface.generate_custom_voice("Hello world", "English", "Vivian", max_frames=4)
    )
    assert 1 <= len(frames) <= 4
    assert all(len(f) == 16 for f in frames)


def test_voice_design_sync(iface):
    frames = list(
        iface.generate_voice_design(
            "Hello", "Calm male voice", "English", max_frames=3
        )
    )
    assert 1 <= len(frames) <= 3


def test_custom_voice_async(iface):
    async def main():
        await iface.start()
        out = []
        gen = iface.generate_custom_voice_async("Hi there", "English", "Vivian")
        i = 0
        async for f in gen:
            out.append(f)
            i += 1
            if i >= 3:  # caller-side stop exercises cancellation/cleanup
                break
        await gen.aclose()
        await iface.stop()
        return out

    out = asyncio.run(main())
    assert 1 <= len(out) <= 3
    assert not iface.engine.has_work()


def test_voice_clone_icl_end_to_end(iface, rng):
    hop = iface.speech_tokenizer.cfg.hop
    ref_wav = (rng.standard_normal(8 * hop) * 0.1).astype(np.float32)
    prompt = iface.create_voice_clone_prompt(
        (ref_wav, 24000), ref_text="reference words", x_vector_only_mode=False
    )
    assert prompt["ref_code"].shape[1] == 16
    assert prompt["ref_spk_embedding"].shape == (
        iface.model_config.talker_config.hidden_size,
    )
    frames = list(
        iface.generate_voice_clone(
            "Cloned speech", voice_clone_prompt=prompt, non_streaming_mode=True,
            max_frames=3,
        )
    )
    assert 1 <= len(frames) <= 3


def test_voice_clone_xvector_only(iface, rng):
    hop = iface.speech_tokenizer.cfg.hop
    ref_wav = (rng.standard_normal(6 * hop) * 0.1).astype(np.float32)
    prompt = iface.create_voice_clone_prompt(
        (ref_wav, 24000), x_vector_only_mode=True
    )
    assert prompt["ref_code"] is None
    frames = list(
        iface.generate_voice_clone(
            "XV speech", voice_clone_prompt=prompt, max_frames=2
        )
    )
    assert len(frames) >= 1


def test_codes_to_audio(iface, rng):
    frames = [list(rng.integers(0, 64, size=16)) for _ in range(5)]
    wavs, sr = iface.codes_to_audio(frames)
    assert sr == 24000
    assert wavs[0].shape == (5 * iface.speech_tokenizer.cfg.hop,)
