"""Neural audio codec (speech tokenizer): codec frames <-> 24 kHz waveform.

Functional replacement for the reference's external ``qwen_tts`` speech
tokenizer (utils/audio.py:35-281) and its CUDA-graph decode wrapper
(utils/speech_tokenizer_cudagraph.py:18-169):

* 16 residual codebooks, 12.5 Hz frame rate, 1920-sample hop at 24 kHz
  (one frame == 80 ms of audio);
* decoder: per-codebook embedding sum -> causal SEANet-style upsampling
  ConvNet (transposed convs with rates 8*6*5*8 = 1920) -> tanh waveform;
* encoder (voice clone): mirrored strided ConvNet -> 16-stage residual VQ
  against the same codebooks;
* streaming: ``chunked_decode`` overlap windows with left-context trim
  (chunk 300 / context 25 — speech_tokenizer_cudagraph.py:127-157), and the
  per-chunk windowed decode policy the server uses.

The reference replays 50 captured CUDA graphs for decoder lengths T=1..50
(speech_tokenizer_cudagraph.py:18-56); here decode lengths are padded to a
handful of buckets and each bucket is one jitted XLA program.

NOTE on weights: the upstream ``qwen_tts`` package (and its checkpoint
format) is not available in this environment, so the architecture here is
this repo's own — an independent SEANet/RVQ design with the same external
contract (frame rate, codebook count/size, sample rate, streaming policy).
``CodecParams`` can be loaded from a converted ``codec.safetensors``; tests
and benches run with seeded random weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CodecConfig:
    num_codebooks: int = 16
    codebook_size: int = 2048
    latent_dim: int = 512
    base_channels: int = 96
    upsample_rates: tuple = (8, 6, 5, 8)  # product == hop
    sample_rate: int = 24000
    # decode matmul precision: "float32" (default; exact) or "bfloat16"
    # (2.1x faster batched decode on v5e at ~0.25% waveform error — opt in
    # for throughput-bound serving)
    compute_dtype: str = "float32"

    @property
    def hop(self) -> int:
        h = 1
        for r in self.upsample_rates:
            h *= r
        return h

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop  # 12.5 Hz


# ---------------------------------------------------------------------------
# conv primitives (NCT layout, causal)
# ---------------------------------------------------------------------------


def conv1d(x, w, b, dilation: int = 1, stride: int = 1):
    """Causal conv: left-pad (k-1)*dilation. x [B,C,T], w [O,I,K]."""
    k = w.shape[-1]
    pad = (k - 1) * dilation
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(pad, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return y + b[None, :, None]


def conv_transpose1d(x, w, b, stride: int):
    """Upsampling transposed conv, trimmed to exactly T*stride (causal-ish).

    x [B, C, T], w [I, O, K] with K = 2*stride.
    """
    k = w.shape[-1]
    # FULL padding -> length (T-1)*stride + K; output[n] depends only on
    # input[t <= n // stride], so keeping the first T*stride samples is a
    # causal upsampler.
    y = jax.lax.conv_transpose(
        x, w,
        strides=(stride,),
        padding=[(k - 1, k - 1)],
        dimension_numbers=("NCH", "IOH", "NCH"),
    )
    T = x.shape[-1]
    y = y[..., : T * stride]
    return y + b[None, :, None]


def _elu(x):
    return jax.nn.elu(x)


# ---------------------------------------------------------------------------
# MXU-formulated decode primitives (channels-last)
#
# XLA lowers small-channel NCT conv1ds to padded convolutions that run the
# TPU MXU at <1% utilization (measured 34 ms for a 12-frame decode window).
# The same math expressed as channels-last matmuls — im2col for K-tap convs,
# a two-matmul split for stride-r transposed convs — is MXU-shaped: rows are
# time steps, the contraction dim is (K*C_in). Numerically identical to the
# lax.conv path (tests/test_audio.py pins them together); measured >10x
# faster for the decode window on v5e.
# ---------------------------------------------------------------------------


def conv1d_mm(x, w, b, dilation: int = 1):
    """Causal K-tap conv as K accumulated matmuls. x [B,T,C], w [O,I,K].

    Shifted-dots instead of one im2col matmul: the im2col concat
    materializes a [B, T, K*C] buffer (hundreds of MB at waveform-rate T),
    while K dots over shifted views read the input in place — measured 11%
    faster for the batch-8 12-frame decode window on v5e, and it unlocks
    the bf16 compute path (2.1x) without giant intermediate buffers."""
    k = w.shape[-1]
    if k == 1:
        return x @ w[:, :, 0].T + b
    pad = (k - 1) * dilation
    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    T = x.shape[1]
    # tap j sees input at t - (k-1-j)*d == xp[t + j*d]
    y = None
    for j in range(k):
        yj = xp[:, j * dilation : j * dilation + T, :] @ w[:, :, j].T
        y = yj if y is None else y + yj
    return y + b


def conv_transpose1d_mm(x, w, b, stride: int):
    """Stride-r transposed conv (K=2r, trimmed to T*r) as two matmuls.

    Matches conv_transpose1d: y[m*r+j] = x[m]@Wf[j] + x[m-1]@Wf[r+j] where
    Wf is the kernel flipped along K (lax.conv_transpose does not flip).
    x [B,T,C], w [I,O,K].
    """
    r = stride
    I, O, K = w.shape
    assert K == 2 * r, (K, r)
    wf = w[:, :, ::-1]  # [I, O, 2r]; tap j of wf multiplies x[t] into y[t*r+j]
    wa = jnp.transpose(wf[:, :, :r], (0, 2, 1)).reshape(I, r * O)
    wb = jnp.transpose(wf[:, :, r:], (0, 2, 1)).reshape(I, r * O)
    B, T, _ = x.shape
    ya = x @ wa  # [B, T, r*O]
    x_prev = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :-1]
    yb = x_prev @ wb
    return (ya + yb).reshape(B, T * r, O) + b


def _res_unit_mm(x, ru, dil):
    h = _elu(x)
    h = conv1d_mm(h, ru["w1"], ru["b1"], dilation=dil)
    h = _elu(h)
    h = conv1d_mm(h, ru["w2"], ru["b2"])
    return x + h


def decode_latent_mm(params, lat, rates, compute_dtype=jnp.float32):
    """decode_latent with MXU-formulated primitives. lat [B, D, T]."""
    c = lambda a: a.astype(compute_dtype)  # noqa: E731
    x = c(jnp.swapaxes(lat, 1, 2))  # [B, T, D]
    x = conv1d_mm(x, c(params["dec_in_w"]), c(params["dec_in_b"]))
    for block, r in zip(params["dec_blocks"], rates):
        x = _elu(x)
        x = conv_transpose1d_mm(x, c(block["up_w"]), c(block["up_b"]), r)
        for ru, dil in zip(block["res"], RES_DILATIONS):
            h = _elu(x)
            h = conv1d_mm(h, c(ru["w1"]), c(ru["b1"]), dilation=dil)
            h = _elu(h)
            h = conv1d_mm(h, c(ru["w2"]), c(ru["b2"]))
            x = x + h
    x = _elu(x)
    x = conv1d_mm(x, c(params["dec_out_w"]), c(params["dec_out_b"]))
    return jnp.tanh(jnp.swapaxes(x, 1, 2).astype(jnp.float32))  # [B,1,T*hop]


# ---------------------------------------------------------------------------
# parameter construction
# ---------------------------------------------------------------------------


def _conv_w(key, o, i, k, scale=None):
    scale = scale or (1.0 / np.sqrt(i * k))
    return jax.random.normal(key, (o, i, k), jnp.float32) * scale


def init_codec_params(cfg: CodecConfig, key) -> dict:
    ks = iter(jax.random.split(key, 200))
    C0 = cfg.base_channels * 8  # 768
    params = {
        "codebooks": jax.random.normal(
            next(ks), (cfg.num_codebooks, cfg.codebook_size, cfg.latent_dim)
        )
        * 0.05,
        "dec_in_w": _conv_w(next(ks), C0, cfg.latent_dim, 7),
        "dec_in_b": jnp.zeros(C0),
        "dec_blocks": [],
        "dec_out_w": _conv_w(next(ks), 1, cfg.base_channels, 7),
        "dec_out_b": jnp.zeros(1),
        "enc_in_w": _conv_w(next(ks), cfg.base_channels, 1, 7),
        "enc_in_b": jnp.zeros(cfg.base_channels),
        "enc_blocks": [],
        "enc_out_w": _conv_w(next(ks), cfg.latent_dim, C0, 7),
        "enc_out_b": jnp.zeros(cfg.latent_dim),
    }
    ch = C0
    for r in cfg.upsample_rates:
        out_ch = max(cfg.base_channels, ch // 2)
        block = {
            "up_w": jax.random.normal(next(ks), (ch, out_ch, 2 * r), jnp.float32)
            * (1.0 / np.sqrt(ch * 2 * r)),
            "up_b": jnp.zeros(out_ch),
            "res": [],
        }
        for _dil in (1, 3):
            block["res"].append(
                {
                    "w1": _conv_w(next(ks), out_ch, out_ch, 7),
                    "b1": jnp.zeros(out_ch),
                    "w2": _conv_w(next(ks), out_ch, out_ch, 1),
                    "b2": jnp.zeros(out_ch),
                }
            )
        params["dec_blocks"].append(block)
        ch = out_ch
    # encoder mirrors in reverse
    ch = cfg.base_channels
    for r in reversed(cfg.upsample_rates):
        out_ch = min(C0, ch * 2)
        block = {
            "down_w": _conv_w(next(ks), out_ch, ch, 2 * r),
            "down_b": jnp.zeros(out_ch),
            "res": [
                {
                    "w1": _conv_w(next(ks), ch, ch, 7),
                    "b1": jnp.zeros(ch),
                    "w2": _conv_w(next(ks), ch, ch, 1),
                    "b2": jnp.zeros(ch),
                }
                for _d in (1, 3)
            ],
        }
        params["enc_blocks"].append(block)
        ch = out_ch
    return params


# ---------------------------------------------------------------------------
# decode / encode (pure functions)
# ---------------------------------------------------------------------------


RES_DILATIONS = (1, 3)  # structural: res unit j uses dilation RES_DILATIONS[j]


def _res_unit(x, ru, dil):
    h = _elu(x)
    h = conv1d(h, ru["w1"], ru["b1"], dilation=dil)
    h = _elu(h)
    h = conv1d(h, ru["w2"], ru["b2"])
    return x + h


def codes_to_latent(params, codes):
    """codes [B, NB, T] int -> latent [B, D, T] (sum of codebook embeddings)."""
    cb = params["codebooks"]  # [NB, V, D]
    parts = [cb[i][codes[:, i]] for i in range(cb.shape[0])]  # each [B, T, D]
    lat = jnp.sum(jnp.stack(parts), axis=0)  # [B, T, D]
    return jnp.swapaxes(lat, 1, 2)


def decode_latent(params, lat, rates):
    x = conv1d(lat, params["dec_in_w"], params["dec_in_b"])
    for block, r in zip(params["dec_blocks"], rates):
        x = _elu(x)
        x = conv_transpose1d(x, block["up_w"], block["up_b"], r)
        for ru, dil in zip(block["res"], RES_DILATIONS):
            x = _res_unit(x, ru, dil)
    x = _elu(x)
    x = conv1d(x, params["dec_out_w"], params["dec_out_b"])
    return jnp.tanh(x)  # [B, 1, T*hop]


def codec_decode(params, codes, rates=(8, 6, 5, 8), impl="mm",
                 compute_dtype=jnp.float32):
    """codes [B, NB, T] -> wav [B, T*hop] float32.

    impl="mm" (default) uses the MXU matmul formulation; impl="conv" is the
    reference lax.conv path (identical numerics, kept for tests)."""
    lat = codes_to_latent(params, codes)
    if impl == "mm":
        return decode_latent_mm(params, lat, rates, compute_dtype)[:, 0, :]
    return decode_latent(params, lat, rates)[:, 0, :]


def encode_latent(params, wav, rates=(8, 6, 5, 8)):
    """wav [B, 1, T*hop] -> latent [B, D, T]."""
    x = conv1d(wav, params["enc_in_w"], params["enc_in_b"])
    for block, r in zip(params["enc_blocks"], reversed(rates)):
        for ru, dil in zip(block["res"], RES_DILATIONS):
            x = _res_unit(x, ru, dil)
        x = _elu(x)
        x = conv1d(x, block["down_w"], block["down_b"], stride=r)
    x = _elu(x)
    return conv1d(x, params["enc_out_w"], params["enc_out_b"])


def rvq_quantize(params, lat):
    """Residual VQ: latent [B, D, T] -> codes [B, NB, T]."""
    cb = params["codebooks"]  # [NB, V, D]
    x = jnp.swapaxes(lat, 1, 2)  # [B, T, D]
    residual = x
    codes = []
    for i in range(cb.shape[0]):
        book = cb[i]  # [V, D]
        d = (
            jnp.sum(residual**2, -1, keepdims=True)
            - 2.0 * residual @ book.T
            + jnp.sum(book**2, -1)[None, None, :]
        )
        idx = jnp.argmin(d, axis=-1)  # [B, T]
        codes.append(idx)
        residual = residual - book[idx]
    return jnp.stack(codes, axis=1).astype(jnp.int32)  # [B, NB, T]


def codec_encode(params, wav, rates=(8, 6, 5, 8)):
    """wav [B, samples] -> codes [B, NB, T] (samples truncated to hop grid)."""
    return rvq_quantize(params, encode_latent(params, wav[:, None, :], rates))


# ---------------------------------------------------------------------------
# SpeechTokenizer wrapper (API parity with utils/audio.py SpeechTokenizer)
# ---------------------------------------------------------------------------

_LENGTH_BUCKETS = (8, 16, 32, 64, 128, 256, 350)


class SpeechTokenizer:
    """Bucketed-jit codec front end.

    decode accepts the same shapes the reference accepts (utils/audio.py
    decode: [B, NB, T] tensors, [T, NB] chunk lists, or dicts with
    "audio_codes") and returns (wavs, sample_rate).
    """

    def __init__(
        self,
        cfg: Optional[CodecConfig] = None,
        params: Optional[dict] = None,
        seed: int = 0,
    ):
        self.cfg = cfg or CodecConfig()
        self.params = (
            params
            if params is not None
            else init_codec_params(self.cfg, jax.random.PRNGKey(seed))
        )
        self.sample_rate = self.cfg.sample_rate
        cdt = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        self._decode_jit = jax.jit(
            partial(codec_decode, rates=self.cfg.upsample_rates,
                    compute_dtype=cdt)
        )
        def _decode_pcm16(params, codes):
            wav = codec_decode(params, codes, rates=self.cfg.upsample_rates,
                               compute_dtype=cdt)
            return jnp.round(
                jnp.clip(wav, -1.0, 1.0) * 32767.0
            ).astype(jnp.int16)

        # int16 on device: halves the device->host transfer for streaming
        self._decode_pcm16_jit = jax.jit(_decode_pcm16)
        self._encode_jit = jax.jit(
            partial(codec_encode, rates=self.cfg.upsample_rates)
        )

    # -- helpers ------------------------------------------------------------

    def _bucket(self, t: int) -> int:
        for b in _LENGTH_BUCKETS:
            if t <= b:
                return b
        return ((t + 349) // 350) * 350

    @staticmethod
    def normalize_codes(codes) -> np.ndarray:
        """-> [B, NB, T] int32 from any accepted input shape."""
        if isinstance(codes, dict):
            codes = codes["audio_codes"]
        if isinstance(codes, (list, tuple)):
            if len(codes) and isinstance(codes[0], dict):
                return SpeechTokenizer.normalize_codes(codes[0])
            arr = np.asarray(codes)  # [T, NB] chunk list
            if arr.ndim == 2:
                arr = arr.T[None]
            return arr.astype(np.int32)
        arr = np.asarray(codes)
        if arr.ndim == 2:  # [T, NB]
            arr = arr.T[None]
        return arr.astype(np.int32)

    # -- public API ---------------------------------------------------------

    @staticmethod
    def _fetch(dev_arr) -> np.ndarray:
        """np.asarray with the transfer started eagerly (on a remote-relay
        device a cold fetch pays a full round trip; an in-flight copy
        overlaps with any interleaved work, e.g. other streams' decodes)."""
        try:
            dev_arr.copy_to_host_async()
        except Exception:
            pass
        return np.asarray(dev_arr)

    def decode(self, codes) -> tuple[list[np.ndarray], int]:
        """codes (any accepted form) -> (list of float32 wavs, sample_rate)."""
        arr = self.normalize_codes(codes)
        B, NB, T = arr.shape
        tb = self._bucket(T)
        padded = np.zeros((B, NB, tb), np.int32)
        padded[:, :, :T] = arr
        wav = self._fetch(self._decode_jit(self.params, jnp.asarray(padded)))
        n = T * self.cfg.hop
        return [wav[b, :n] for b in range(B)], self.sample_rate

    def decode_window(
        self, codes, left_context_frames: int
    ) -> np.ndarray:
        """Decode a window and trim the left-context samples — the server's
        streaming chunk policy (examples/server.py:645-698)."""
        wavs, _ = self.decode(codes)
        return wavs[0][left_context_frames * self.cfg.hop :]

    def decode_pcm16(self, codes) -> list[np.ndarray]:
        """Decode straight to int16 PCM on device (half the transfer)."""
        dev, n = self.dispatch_pcm16(codes)
        pcm = np.asarray(dev)
        return [pcm[b, :n] for b in range(pcm.shape[0])]

    def dispatch_pcm16(self, codes):
        """Non-blocking half of decode_pcm16: enqueue the decode and start
        the device->host copy, return (device array [B, samples], n_valid).

        Lets the caller run the blocking fetch on a different thread than
        the device-dispatch thread (engine/device_executor.FETCH_EXECUTOR),
        so a high-latency host<->device link doesn't stall other device
        work behind the transfer."""
        arr = self.normalize_codes(codes)
        B, NB, T = arr.shape
        tb = self._bucket(T)
        padded = np.zeros((B, NB, tb), np.int32)
        padded[:, :, :T] = arr
        dev = self._decode_pcm16_jit(self.params, jnp.asarray(padded))
        try:
            dev.copy_to_host_async()
        except Exception:
            pass
        return dev, T * self.cfg.hop

    def chunked_decode(
        self, codes, chunk_size: int = 300, left_context: int = 25
    ) -> tuple[list[np.ndarray], int]:
        """Overlap-window decode of long sequences
        (speech_tokenizer_cudagraph.py:127-157)."""
        arr = self.normalize_codes(codes)
        B, NB, T = arr.shape
        outs = []
        for b in range(B):
            pieces = []
            s = 0
            while s < T:
                e = min(s + chunk_size, T)
                cs = max(0, s - left_context)
                win = arr[b : b + 1, :, cs:e]
                wav, _ = self.decode(win)
                pieces.append(wav[0][(s - cs) * self.cfg.hop :])
                s = e
            outs.append(np.concatenate(pieces))
        return outs, self.sample_rate

    def encode(self, wav: np.ndarray, sr: int = 24000):
        """wav [samples] -> codes [T, NB] int32 (voice-clone reference path,
        utils/audio.py:82-123)."""
        from nano_qwen3tts_tpu.audio.wav import resample

        wav = resample(np.asarray(wav, np.float32), sr, self.sample_rate)
        n = (len(wav) // self.cfg.hop) * self.cfg.hop
        if n == 0:
            raise ValueError("audio shorter than one codec frame")
        codes = np.asarray(self._encode_jit(self.params, jnp.asarray(wav[None, :n])))
        return codes[0].T  # [T, NB]


def load_codec(model_path: str) -> SpeechTokenizer:
    """Load codec weights from <model_path>/codec.safetensors if present,
    else seeded random weights (documented limitation: the upstream codec
    checkpoint format is unavailable in this environment).

    Serving default is bfloat16 decode compute (2.1x batched decode on v5e
    at ~0.25% waveform error, ≈ -52 dB — below audibility); set
    CODEC_COMPUTE_DTYPE=float32 for bit-exact decode. The library-level
    CodecConfig default stays float32 so direct users and tests get exact
    numerics unless they opt in."""
    import os

    path = os.path.join(model_path, "codec.safetensors")
    cdt = os.environ.get("CODEC_COMPUTE_DTYPE", "bfloat16")
    if cdt not in ("float32", "bfloat16"):
        # near-miss spellings ('bf16', 'fp32') would otherwise silently
        # select the wrong compute path (ADVICE r1)
        raise ValueError(
            f"CODEC_COMPUTE_DTYPE={cdt!r}: use 'float32' or 'bfloat16'"
        )
    cfg = CodecConfig(compute_dtype=cdt)
    if os.path.exists(path):
        from safetensors import safe_open

        flat = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                flat[k] = jnp.asarray(f.get_tensor(k))
        params = _unflatten(flat)
        return SpeechTokenizer(cfg, params)
    return SpeechTokenizer(cfg)


def _param_key(path) -> str:
    import jax.tree_util as jtu

    parts = []
    for p in path:
        if isinstance(p, jtu.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jtu.SequenceKey):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def flatten_codec_params(params: dict) -> dict:
    """Pytree -> {dotted_key: array} for safetensors serialization."""
    import jax.tree_util as jtu

    leaves = jtu.tree_flatten_with_path(params)[0]
    return {_param_key(path): np.asarray(leaf) for path, leaf in leaves}


def _unflatten(flat: dict, cfg: Optional[CodecConfig] = None) -> dict:
    """Rebuild the params pytree from dotted keys using the init structure
    as a template (codec params mix dicts and lists)."""
    import jax.tree_util as jtu

    template = init_codec_params(cfg or CodecConfig(), jax.random.PRNGKey(0))
    leaves, treedef = jtu.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves:
        key = _param_key(path)
        new_leaves.append(jnp.asarray(flat[key]))
    return jtu.tree_unflatten(jtu.tree_structure(template), new_leaves)
