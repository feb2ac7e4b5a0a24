"""Audio stack tests: WAV I/O, mel, codec, speaker encoder."""

import io

import numpy as np
import pytest

from nano_qwen3tts_tpu.audio import wav as W
from nano_qwen3tts_tpu.audio.codec import CodecConfig, SpeechTokenizer
from nano_qwen3tts_tpu.audio.mel import mel_filterbank, mel_spectrogram, stft_magnitude
from nano_qwen3tts_tpu.audio.speaker import SpeakerEncoder


class TestWav:
    def test_roundtrip(self, rng):
        x = np.clip(rng.standard_normal(2400) * 0.3, -0.99, 0.99).astype(np.float32)
        buf = io.BytesIO()
        W.write_wav(buf, x, 24000)
        buf.seek(0)
        y, sr = W.read_wav(buf)
        assert sr == 24000
        np.testing.assert_allclose(x, y, atol=1.5 / 32768)

    def test_pcm16_clip(self):
        x = np.array([-2.0, 0.0, 2.0], np.float32)
        p = W.float_to_pcm16(x)
        assert p[0] == -32767 and p[2] == 32767

    def test_resample_identity_and_ratio(self, rng):
        x = rng.standard_normal(1000).astype(np.float32)
        assert W.resample(x, 24000, 24000) is not None
        y = W.resample(x, 16000, 24000)
        assert abs(len(y) - 1500) <= 1


class TestMel:
    def test_stft_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        y = rng.standard_normal(4096).astype(np.float32)
        got = stft_magnitude(y, 1024, 256, 1024)
        pad = (1024 - 256) // 2
        yt = torch.nn.functional.pad(
            torch.from_numpy(y)[None, None], (pad, pad), mode="reflect"
        )[0, 0]
        spec = torch.stft(
            yt, n_fft=1024, hop_length=256, win_length=1024,
            window=torch.hann_window(1024), center=False, return_complex=True,
        )
        want = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9).numpy()
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_filterbank_shape_and_coverage(self):
        fb = mel_filterbank(24000, 1024, 128, 0, 12000)
        assert fb.shape == (128, 513)
        assert (fb >= 0).all()
        # every mel band has some support
        assert (fb.sum(axis=1) > 0).all()

    def test_mel_spectrogram_shape(self, rng):
        y = rng.standard_normal(24000).astype(np.float32)
        m = mel_spectrogram(y)
        assert m.shape[0] == 128
        assert m.shape[1] == 24000 // 256


@pytest.fixture(scope="module")
def codec():
    return SpeechTokenizer(CodecConfig.tiny(), seed=0)


class TestCodec:
    def test_decode_shapes_and_determinism(self, codec, rng):
        T = 12
        codes = rng.integers(0, 64, size=(1, 16, T)).astype(np.int32)
        wavs, sr = codec.decode(codes)
        assert sr == 24000
        assert wavs[0].shape == (T * codec.cfg.hop,)
        wavs2, _ = codec.decode(codes)
        np.testing.assert_array_equal(wavs[0], wavs2[0])

    def test_decode_is_real_code2wav_architecture(self, codec, rng):
        """The wrapper decodes through the faithful Code2Wav decoder (the
        torch-parity oracle lives in tests/test_code2wav_parity.py)."""
        from nano_qwen3tts_tpu.audio.code2wav import code2wav_decode

        codes = rng.integers(0, 64, size=(2, 16, 9)).astype(np.int32)
        direct = np.asarray(
            code2wav_decode(
                codec.params["decoder"], codes, codec.cfg.code2wav()
            )
        )
        wavs, _ = codec.decode(codes)
        n = 9 * codec.cfg.hop
        # bucket-pad repeats the last frame; samples clear of the decoder
        # head's one-step lookahead must agree with the exact-length decode
        # (atol: different pad shapes compile to different fusion orders,
        # and random-weight SnakeBeta exp/sin chains amplify fp32 noise)
        clear = n - 2 * codec.cfg.hop
        np.testing.assert_allclose(
            wavs[0][:clear], direct[0][:clear], atol=2e-3
        )

    def test_decode_accepts_chunk_list(self, codec, rng):
        chunks = [list(rng.integers(0, 64, size=16)) for _ in range(5)]
        wavs, _ = codec.decode(chunks)
        assert wavs[0].shape == (5 * codec.cfg.hop,)

    def test_bucketing_transparent(self, codec, rng):
        """Same codes decoded at different pad buckets agree everywhere the
        decoder head's one-step lookahead cannot see the continuation (the
        upstream decoder is causal except that lookahead — code2wav.py)."""
        codes = rng.integers(0, 64, size=(1, 16, 7)).astype(np.int32)
        w1, _ = codec.decode(codes)  # bucket 8
        big = np.repeat(codes[:, :, -1:], 30, axis=2)
        big[:, :, :7] = codes
        w2, _ = codec.decode(big)  # bucket 32, same continuation
        np.testing.assert_allclose(w1[0], w2[0][: len(w1[0])], atol=2e-3)

    def test_chunked_decode_matches_full(self, codec, rng):
        T = 40
        codes = rng.integers(0, 64, size=(1, 16, T)).astype(np.int32)
        full, _ = codec.decode(codes)
        # left context must exceed the decoder's receptive field (~20 frames;
        # the production policy uses 25 — the upstream chunked_decode default)
        chunked, _ = codec.chunked_decode(codes, chunk_size=16, left_context=25)
        assert chunked[0].shape == full[0].shape
        # identical except float noise AWAY from chunk tails: each chunk's
        # final ~1 frame differs from the full decode because the decoder
        # head peeks one step past the chunk boundary (inherent to the
        # upstream streaming policy too — its chunked_decode is the same
        # approximation).
        hop = codec.cfg.hop
        mask = np.ones(T, bool)
        for e in range(16, T, 16):
            mask[e - 2 : e] = False
        sample_mask = np.repeat(mask, hop)
        np.testing.assert_allclose(
            chunked[0][sample_mask], full[0][sample_mask], atol=2e-3
        )

    def test_encode_decode_roundtrip_shapes(self, codec, rng):
        wav = rng.standard_normal(10 * codec.cfg.hop).astype(np.float32) * 0.1
        codes = codec.encode(wav, sr=24000)
        assert codes.shape == (10, 16)
        assert (codes >= 0).all() and (codes < 64).all()
        wavs, _ = codec.decode(codes)
        assert wavs[0].shape == (10 * codec.cfg.hop,)

    def test_decode_window_trims_context(self, codec, rng):
        codes = rng.integers(0, 64, size=(1, 16, 10)).astype(np.int32)
        out = codec.decode_window(codes, left_context_frames=4)
        assert out.shape == (6 * codec.cfg.hop,)

    def test_bfloat16_compute_path_runs(self, codec, rng):
        """The opt-in bf16 decode path runs and stays finite/bounded. NOTE:
        closeness to f32 is NOT asserted — with random weights the real
        Code2Wav stack saturates and amplifies chaotically (~26% relative
        RMS, meaningless in both directions), which is exactly why the
        serving default is float32 until real weights exist to validate
        bf16 against (load_codec docstring / CODEC_ARCH.md)."""
        import dataclasses

        cfg16 = dataclasses.replace(codec.cfg, compute_dtype="bfloat16")
        codec16 = SpeechTokenizer(cfg16, codec.params)
        codes = rng.integers(0, 64, size=(2, 16, 12)).astype(np.int32)
        out, _ = codec16.decode(codes)
        for o in out:
            assert np.isfinite(o).all()
            assert np.abs(o).max() <= 1.0

    def test_load_codec_serving_default_is_f32(self, tmp_path, monkeypatch):
        """Env plumbing only — stub out the (production-size) random init so
        the test doesn't build tens of millions of params (ADVICE r1)."""
        import nano_qwen3tts_tpu.audio.codec as codec_mod
        from nano_qwen3tts_tpu.audio.codec import load_codec

        seen = {}

        class _Stub:
            def __init__(self, cfg, params=None, seed=0):
                seen["cfg"] = cfg

        monkeypatch.setattr(codec_mod, "SpeechTokenizer", _Stub)
        monkeypatch.delenv("CODEC_COMPUTE_DTYPE", raising=False)
        load_codec(str(tmp_path))
        assert seen["cfg"].compute_dtype == "float32"
        monkeypatch.setenv("CODEC_COMPUTE_DTYPE", "bfloat16")
        load_codec(str(tmp_path))
        assert seen["cfg"].compute_dtype == "bfloat16"
        # near-miss spellings fail loudly instead of silently picking f32
        monkeypatch.setenv("CODEC_COMPUTE_DTYPE", "bf16")
        with pytest.raises(ValueError, match="CODEC_COMPUTE_DTYPE"):
            load_codec(str(tmp_path))


class TestSpeakerEncoder:
    def test_xvector_shape_and_determinism(self, rng):
        from nano_qwen3tts_tpu.config import SpeakerEncoderConfig

        cfg = SpeakerEncoderConfig(
            enc_dim=64, enc_channels=(32, 32, 32, 32, 96),
            enc_attention_channels=16, enc_res2net_scale=4, enc_se_channels=16,
        )
        enc = SpeakerEncoder(cfg, seed=0)
        wav = rng.standard_normal(24000).astype(np.float32) * 0.3
        v1 = enc.extract(wav, 24000)
        assert v1.shape == (64,)
        v2 = enc.extract(wav, 24000)
        np.testing.assert_allclose(v1, v2, atol=1e-5)
        v3 = enc.extract(rng.standard_normal(24000).astype(np.float32), 24000)
        assert not np.allclose(v1, v3)


def test_dispatch_pcm16_matches_decode_pcm16(codec):
    """The split dispatch/fetch path must produce the same PCM as the
    blocking decode (server DecodeWorker uses dispatch + off-thread fetch)."""
    rng = np.random.default_rng(3)
    codes = rng.integers(
        0, codec.cfg.codebook_size, size=(2, codec.cfg.num_codebooks, 7)
    ).astype(np.int64)
    want = codec.decode_pcm16(codes)
    dev, n = codec.dispatch_pcm16(codes)
    pcm = np.asarray(dev)
    got = [pcm[b, :n] for b in range(pcm.shape[0])]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_codec_param_dtype_variants():
    """Weight-storage dtype options (bf16 / int8 weight-only) must run the
    full bucketed decode pipeline with identical output shapes; int8
    per-channel quantization itself must be tight (fidelity through the
    full stack is only judgeable against REAL weights — CODEC_ARCH.md
    assumed #4 — so serving default stays f32 and these are measured
    opt-ins, PARITY.md codec table)."""
    import jax
    import jax.numpy as jnp

    from nano_qwen3tts_tpu.audio.code2wav import quantize_decoder_params
    from nano_qwen3tts_tpu.audio.codec import CodecConfig, SpeechTokenizer

    codes = np.random.default_rng(0).integers(0, 64, size=(2, 16, 12),
                                              dtype=np.int64)
    ref = None
    for pdt in ("float32", "bfloat16", "int8"):
        st = SpeechTokenizer(CodecConfig.tiny(param_dtype=pdt), seed=3)
        wavs, sr = st.decode(codes)
        assert sr == st.cfg.sample_rate
        out = np.stack(wavs)
        if ref is None:
            ref = out
        else:
            assert out.shape == ref.shape
            assert np.isfinite(out).all()
    # the quantizer itself: per-out-channel int8 on a big tensor is tight
    w = jax.random.normal(jax.random.PRNGKey(0), (7, 256, 256)) * jnp.exp(
        jax.random.normal(jax.random.PRNGKey(1), (256,))  # varied channel scales
    )
    q = quantize_decoder_params({"w": w}, min_size=1024)["w"]
    assert q["q8"].dtype == jnp.int8 and q["s"].shape == (1, 1, 256)
    deq = q["q8"].astype(jnp.float32) * q["s"]
    err = float(jnp.sqrt(jnp.mean((deq - w) ** 2) / jnp.mean(w**2)))
    # gaussian weights: |max| ~ 3.5 sigma -> step/sqrt(12) ~ 0.008 rel RMS
    assert err < 0.01, err
    # embedding rows: per-row scales, gather path never materializes the table
    emb = jax.random.normal(jax.random.PRNGKey(2), (128, 64))
    qe = quantize_decoder_params({"code_embedding": emb}, min_size=1)[
        "code_embedding"
    ]
    assert qe["s"].shape == (128, 1)
    deq = qe["q8"].astype(jnp.float32) * qe["s"]
    assert float(jnp.max(jnp.abs(deq - emb))) < float(jnp.max(jnp.abs(emb))) / 100
