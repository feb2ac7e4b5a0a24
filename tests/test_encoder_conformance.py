"""Encoder conformance harness (VERDICT r4 next #5).

CODEC_ARCH.md's encoder dossier pins the CONTRACT any faithful Qwen3-TTS
codec encoder must satisfy (the analysis architecture itself is unknowable
offline; this repo's `init_encoder_params` is a documented ASSUMED
placeholder). These tests EXECUTE every pinned, executable fact against the
placeholder so the contract is enforced by CI, not just prose — and so a
future real encoder dropped into the same API is validated by the same
harness:

  #1 output layout + id space: encode -> [T, 16] int32, ids in [0, 2048)
     (tiny config: its own codebook_size), book ORDER stable;
  #2 residual-VQ structure: 16 stages over one latent, per-stage residual
     energy non-increasing (stage 0 coarsest), and the downstream
     combination rule (sum/mean of per-stage embeddings) reconstructs the
     latent monotonically better with more stages;
  #3 frame rate / hop alignment: T frames cover exactly T*hop samples
     (full config: 1920 @ 24 kHz = 12.5 Hz); encode truncates to the hop
     grid;
  #4 input sample rate: encode resamples to the codec rate (24 kHz);
  #5 causal analysis: a prefix of the audio yields the identical prefix of
     codes (streaming-safe, required so ICL prompts align to transcripts);
  #6 round-trip semantic: encode's codes feed the decoder (warm-start
     prefix) and the ICL embedding sum — both consume [T, 16] directly.

Cross-reference: CODEC_ARCH.md "Encoder dossier" pinned facts 1-6; the
checkpoint-conversion side of the contract (documented delta, --encoder
skip, fail-loud encode) is tests/test_weight_conversion.py::
test_codec_convert_decoder_only_and_encoder_delta.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nano_qwen3tts_tpu.audio.codec import (
    CodecConfig,
    SpeechTokenizer,
    codec_encode,
    encode_latent,
    rvq_quantize,
)

CFG = CodecConfig.tiny()


@pytest.fixture(scope="module")
def codec():
    return SpeechTokenizer(CFG, seed=0)


def tone(seconds=0.6, hz=220.0, sr=24000):
    t = np.arange(int(seconds * sr), dtype=np.float32) / sr
    return (0.3 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_full_config_contract_constants():
    """Pinned fact #3: the production codec is 16 books x 2048 entries at
    12.5 Hz / hop 1920 @ 24 kHz — 80 ms per frame."""
    full = CodecConfig()
    assert full.num_codebooks == 16
    assert full.codebook_size == 2048
    assert full.hop == 1920
    assert full.sample_rate == 24000
    assert full.frame_rate == 12.5


def test_encode_layout_and_id_space(codec):
    """Pinned fact #1: [T, 16] int32 with every id in range."""
    wav = tone()
    codes = codec.encode(wav, sr=24000)
    T = len(wav) // CFG.hop
    assert codes.shape == (T, CFG.num_codebooks)
    assert codes.dtype == np.int32
    assert codes.min() >= 0 and codes.max() < CFG.codebook_size
    # determinism (book order is semantic; a nondeterministic encoder
    # would scramble ICL prompts between calls)
    again = codec.encode(wav, sr=24000)
    np.testing.assert_array_equal(codes, again)


def test_hop_alignment_and_truncation(codec):
    """Pinned fact #3: T frames cover exactly T*hop samples; encode
    truncates sub-frame tails to the hop grid."""
    for n_frames in (1, 3, 7):
        wav = tone(seconds=(n_frames * CFG.hop + CFG.hop // 2) / 24000)
        codes = codec.encode(wav, sr=24000)
        assert codes.shape[0] == n_frames
    with pytest.raises(ValueError, match="shorter than one codec frame"):
        codec.encode(np.zeros(CFG.hop - 1, np.float32), 24000)


def test_input_resampled_to_codec_rate(codec):
    """Pinned fact #4: caller audio at any rate is resampled to 24 kHz
    before analysis — same audio content at 2x the rate must give the
    same frame count (and mostly the same codes)."""
    wav24 = tone(seconds=0.512)
    # the same analogue signal sampled at 48 kHz
    wav48 = tone(seconds=0.512, sr=48000)
    c24 = codec.encode(wav24, sr=24000)
    c48 = codec.encode(wav48, sr=48000)
    assert c24.shape == c48.shape
    # resampling is not bit-exact; agreement must still dominate
    agree = (c24 == c48).mean()
    assert agree > 0.5, agree


def test_causal_prefix_stability(codec):
    """Pinned fact #5 (streaming/ICL alignment): analysis is causal —
    encoding a longer signal must not change the codes of its prefix."""
    wav = tone(seconds=0.8)
    full = codec.encode(wav, sr=24000)
    cut = 5 * CFG.hop
    prefix = codec.encode(wav[:cut], sr=24000)
    np.testing.assert_array_equal(full[:5], prefix)


def test_rvq_residual_monotonicity(codec):
    """Pinned fact #2: 16-stage residual VQ over ONE latent — each stage
    quantizes the previous stage's residual, so reconstruction error is
    non-increasing in the number of stages used."""
    wav = tone(seconds=0.6)
    lat = encode_latent(
        codec.params, jnp.asarray(wav[None, None, : 6 * CFG.hop]), CFG
    )  # [1, D, T]
    cb = codec.params["encoder"]["codebooks"]  # [NB, V, D]
    x = np.asarray(jnp.swapaxes(lat, 1, 2))[0]  # [T, D]
    codes = np.asarray(rvq_quantize(codec.params, lat))[0]  # [NB, T]
    recon = np.zeros_like(x)
    errs = [float(np.mean((x - recon) ** 2))]
    for q in range(CFG.num_codebooks):
        recon = recon + np.asarray(cb[q])[codes[q]]  # [T, D]
        errs.append(float(np.mean((x - recon) ** 2)))
    errs = np.asarray(errs)
    # every stage helps (greedy argmin over a codebook that lowers error);
    # allow equality for degenerate stages but require overall progress
    assert (errs[1:] <= errs[:-1] + 1e-7).all(), errs
    assert errs[-1] < errs[0] * 0.9, errs
    # and the codes produced by the public API are the same RVQ codes
    api = np.asarray(
        codec_encode(
            codec.params, jnp.asarray(wav[None, : 6 * CFG.hop]), CFG
        )
    )[0]
    np.testing.assert_array_equal(api, codes)


def test_round_trip_feeds_decoder_and_icl_sum(codec):
    """Pinned facts #2/#6: the decoder MEANS the 16 per-book embeddings of
    encode's codes (warm-start prefix path) and the talker ICL prompt SUMS
    its own 16 tables over the same [T, 16] — both must consume encode's
    output directly, and the decode must be finite hop-aligned audio."""
    wav = tone(seconds=0.64)
    codes = codec.encode(wav, sr=24000)  # [T, 16]
    wavs, sr = codec.decode(codes)  # chunk-list [T, NB] form
    assert sr == CFG.sample_rate
    assert len(wavs[0]) == codes.shape[0] * CFG.hop
    assert np.isfinite(wavs[0]).all()
    # order sensitivity: swapping two books must change the decode (book
    # identity is semantic — the decoder offsets book q by q*V)
    swapped = codes.copy()
    swapped[:, [0, 1]] = swapped[:, [1, 0]]
    if not np.array_equal(swapped, codes):
        wavs2, _ = codec.decode(swapped)
        assert not np.allclose(wavs[0], wavs2[0])
    # ICL consumption shape: 16 embedding tables summed over the codes
    tables = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (16, CFG.codebook_size, 8))
    )
    icl = tables[np.arange(16)[None, :], codes].sum(axis=1)  # [T, 8]
    assert icl.shape == (codes.shape[0], 8)
