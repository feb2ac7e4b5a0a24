"""Code2Wav decoder parity vs the public torch implementation.

The JAX codec decoder (audio/code2wav.py) is a transcription of
transformers' Qwen3OmniMoeCode2Wav — the public implementation of the Qwen
codec-decoder family that the Qwen3-TTS speech tokenizer belongs to
(CODEC_ARCH.md). These tests build the actual torch module with a tiny
config, convert its state dict through the SAME path a real checkpoint
would take (from_torch_state_dict), and pin the waveform outputs together.
This is the oracle that makes the converter trustworthy: if the upstream
names/layouts or our math drifted, these fail.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe import (  # noqa: E402
    Qwen3OmniMoeCode2WavConfig,
)
from transformers.models.qwen3_omni_moe.modeling_qwen3_omni_moe import (  # noqa: E402
    Qwen3OmniMoeCode2Wav,
)

from nano_qwen3tts_tpu.audio.code2wav import (  # noqa: E402
    Code2WavConfig,
    code2wav_decode,
    from_torch_state_dict,
    torch_name_map,
)

TINY = dict(
    codebook_size=17,
    num_quantizers=16,
    hidden_size=32,
    num_attention_heads=4,
    num_key_value_heads=2,  # exercises GQA repeat
    intermediate_size=48,
    sliding_window=4,  # < T below: exercises the sliding mask
    num_hidden_layers=2,
    decoder_dim=32,
    upsample_rates=(2, 2, 2, 2),
    upsampling_ratios=(2, 2),
)


def _build_pair(seed=0):
    torch.manual_seed(seed)
    tcfg = Qwen3OmniMoeCode2WavConfig(**TINY)
    tcfg._attn_implementation = "eager"
    tmodel = Qwen3OmniMoeCode2Wav(tcfg).eval()
    # randomize: default init leaves many weights at degenerate constants
    with torch.no_grad():
        for p in tmodel.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    jcfg = Code2WavConfig(**TINY)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    jparams = from_torch_state_dict(sd, jcfg)
    return tmodel, jcfg, jparams


def test_state_dict_names_cover_model():
    """The converter schema (torch_name_map) matches the real torch module's
    state dict exactly — no missing, no extra tensors."""
    torch.manual_seed(0)
    tcfg = Qwen3OmniMoeCode2WavConfig(**TINY)
    tcfg._attn_implementation = "eager"
    tmodel = Qwen3OmniMoeCode2Wav(tcfg)
    sd_names = {
        k for k in tmodel.state_dict().keys() if "code_offset" not in k
    }
    map_names = set(torch_name_map(Code2WavConfig(**TINY)).keys())
    assert map_names == sd_names, (
        sorted(map_names - sd_names)[:5], sorted(sd_names - map_names)[:5]
    )


@pytest.mark.parametrize("T", [1, 3, 10])
def test_decode_matches_torch(T):
    tmodel, jcfg, jparams = _build_pair()
    rng = np.random.default_rng(T)
    codes = rng.integers(
        0, TINY["codebook_size"], (2, TINY["num_quantizers"], T)
    ).astype(np.int64)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(codes)).numpy()[:, 0, :]
    out = np.asarray(code2wav_decode(jparams, codes.astype(np.int32), jcfg))
    assert out.shape == ref.shape == (2, jcfg.out_len(T))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_out_len_formula_matches_torch():
    tmodel, jcfg, jparams = _build_pair()
    for T in (1, 2, 7):
        codes = np.zeros((1, TINY["num_quantizers"], T), np.int64)
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(codes))
        assert ref.shape[-1] == jcfg.out_len(T)


def test_full_size_config_dims():
    """The default config reproduces the 12.5 Hz / 1920-sample contract the
    serving stack is built around (frame == 80 ms at 24 kHz)."""
    cfg = Code2WavConfig()
    assert cfg.total_upsample == 1920
    assert cfg.sample_rate / cfg.total_upsample == 12.5
    assert cfg.num_quantizers == 16 and cfg.codebook_size == 2048
