"""Neural audio codec (speech tokenizer): codec frames <-> 24 kHz waveform.

Functional replacement for the reference's external ``qwen_tts`` speech
tokenizer (utils/audio.py:35-281) and its CUDA-graph decode wrapper
(utils/speech_tokenizer_cudagraph.py:18-169):

* 16 residual codebooks x 2048 entries, 12.5 Hz frame rate, 1920-sample
  hop at 24 kHz (one frame == 80 ms of audio);
* **decoder**: the real Qwen codec-decoder architecture (Code2Wav:
  code-embedding mean -> 8-layer sliding-window transformer -> ConvNeXt
  upsampling -> SnakeBeta/transposed-conv head), transcribed from the
  public transformers implementation — see audio/code2wav.py and
  CODEC_ARCH.md for the evidence chain and the known/assumed split;
* **encoder** (voice clone): mirrored strided ConvNet -> 16-stage residual
  VQ. The upstream *encoder* has no public implementation, so this half
  remains this repo's own design (CODEC_ARCH.md "assumed"); real
  deployments can bypass it with precomputed reference codes;
* streaming: ``chunked_decode`` overlap windows with left-context trim
  (chunk 300 / context 25 — the exact signature of the upstream
  ``Code2Wav.chunked_decode``), and the per-chunk windowed decode policy
  the server uses.

The reference replays 50 captured CUDA graphs for decoder lengths T=1..50
(speech_tokenizer_cudagraph.py:18-56); here decode lengths are padded to a
handful of buckets and each bucket is one jitted XLA program. Bucket
padding REPEATS the final frame: the decoder head's transposed convs peek
one input step ahead (audio/code2wav.py docstring), so a sustained-audio
pad keeps the tail of the valid region well-conditioned where zero codes
would splice garbage spectra into the last frames.

Weights: ``load_codec`` reads ``<model>/codec.safetensors`` whose decoder
tensors use the UPSTREAM torch names verbatim (tools/convert_checkpoint.py
validates against that schema), falling back to seeded random weights of
the same architecture when absent.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from nano_qwen3tts_tpu.audio.code2wav import (
    Code2WavConfig,
    code2wav_decode,
    from_torch_state_dict,
    init_code2wav_params,
    torch_name_map,
)


@dataclass(frozen=True)
class CodecConfig:
    """Serving-level codec config: the Code2Wav decoder architecture fields
    (defaults == the full-size upstream config) + the assumed encoder."""

    num_codebooks: int = 16
    codebook_size: int = 2048
    # decoder (Code2Wav) architecture — see audio/code2wav.py
    hidden_size: int = 1024
    num_hidden_layers: int = 8
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    intermediate_size: int = 3072
    sliding_window: int = 72
    decoder_dim: int = 1536
    upsample_rates: tuple = (8, 5, 4, 3)
    upsampling_ratios: tuple = (2, 2)
    # encoder (assumed architecture; voice-clone reference path only)
    latent_dim: int = 512
    base_channels: int = 96
    sample_rate: int = 24000
    # decode matmul precision: "float32" (default; exact) or "bfloat16"
    # (faster batched decode on v5e — opt in for throughput-bound serving)
    compute_dtype: str = "float32"
    # decoder weight STORAGE dtype: "float32" (default), "bfloat16" (halves
    # the HBM weight stream of the weight-bound B=1 window decode), or
    # "int8" (weight-only, per-out-channel scales — quarter the stream;
    # code2wav.quantize_decoder_params). Like compute_dtype, fidelity vs
    # real weights is unvalidatable offline, so f32 stays the default
    # (CODEC_ARCH.md assumed #4); the measured table is in PARITY.md.
    param_dtype: str = "float32"

    @property
    def hop(self) -> int:
        h = 1
        for r in tuple(self.upsample_rates) + tuple(self.upsampling_ratios):
            h *= r
        return h

    @property
    def frame_rate(self) -> float:
        return self.sample_rate / self.hop  # 12.5 Hz

    def code2wav(self) -> Code2WavConfig:
        return Code2WavConfig(
            codebook_size=self.codebook_size,
            num_quantizers=self.num_codebooks,
            hidden_size=self.hidden_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            num_key_value_heads=self.num_key_value_heads,
            intermediate_size=self.intermediate_size,
            sliding_window=self.sliding_window,
            decoder_dim=self.decoder_dim,
            upsample_rates=tuple(self.upsample_rates),
            upsampling_ratios=tuple(self.upsampling_ratios),
            sample_rate=self.sample_rate,
        )

    @staticmethod
    def tiny(**kw) -> "CodecConfig":
        """Small same-structure config for CPU tests/examples/smoke legs."""
        base = dict(
            codebook_size=64, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=4,
            intermediate_size=64, sliding_window=8, decoder_dim=32,
            upsample_rates=(4, 5, 4, 4), upsampling_ratios=(2, 2),
            latent_dim=32, base_channels=8,
        )
        base.update(kw)
        return CodecConfig(**base)

    @property
    def encoder_strides(self) -> tuple:
        """Analysis strides (assumed): the synthesis rates reversed."""
        return tuple(
            reversed(tuple(self.upsample_rates) + tuple(self.upsampling_ratios))
        )


# ---------------------------------------------------------------------------
# conv primitives for the (assumed) encoder (NCT layout, causal)
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


def _elu(x):
    return jax.nn.elu(x)


# ---------------------------------------------------------------------------
# parameter construction
# ---------------------------------------------------------------------------


def _conv_w(key, o, i, k, scale=None):
    scale = scale or (1.0 / np.sqrt(i * k))
    return jax.random.normal(key, (o, i, k), jnp.float32) * scale


ENC_RES_DILATIONS = (1, 3)


def init_encoder_params(cfg: CodecConfig, key) -> dict:
    """The assumed analysis half: strided SEANet-style ConvNet + RVQ
    codebooks (upstream encoder architecture is not public)."""
    ks = iter(jax.random.split(key, 100))
    C0 = cfg.base_channels * 8
    params = {
        "codebooks": jax.random.normal(
            next(ks), (cfg.num_codebooks, cfg.codebook_size, cfg.latent_dim)
        )
        * 0.05,
        "enc_in_w": _conv_w(next(ks), cfg.base_channels, 1, 7),
        "enc_in_b": jnp.zeros(cfg.base_channels),
        "enc_blocks": [],
        "enc_out_w": _conv_w(next(ks), cfg.latent_dim, C0, 7),
        "enc_out_b": jnp.zeros(cfg.latent_dim),
    }
    ch = cfg.base_channels
    for r in cfg.encoder_strides:
        out_ch = min(C0, ch * 2)
        params["enc_blocks"].append(
            {
                "down_w": _conv_w(next(ks), out_ch, ch, 2 * r),
                "down_b": jnp.zeros(out_ch),
                "res": [
                    {
                        "w1": _conv_w(next(ks), ch, ch, 7),
                        "b1": jnp.zeros(ch),
                        "w2": _conv_w(next(ks), ch, ch, 1),
                        "b2": jnp.zeros(ch),
                    }
                    for _d in ENC_RES_DILATIONS
                ],
            }
        )
        ch = out_ch
    return params


def init_codec_params(cfg: CodecConfig, key) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "decoder": init_code2wav_params(cfg.code2wav(), k1),
        "encoder": init_encoder_params(cfg, k2),
    }


# ---------------------------------------------------------------------------
# decode / encode (pure functions)
# ---------------------------------------------------------------------------


def codec_decode(params, codes, cfg: CodecConfig, compute_dtype=jnp.float32):
    """codes [B, NB, T] -> wav [B, out_len(T)] float32 (Code2Wav decoder)."""
    return code2wav_decode(
        params["decoder"], codes, cfg.code2wav(), compute_dtype
    )


def _res_unit(x, ru, dil):
    h = _elu(x)
    h = conv1d(h, ru["w1"], ru["b1"], dilation=dil)
    h = _elu(h)
    h = conv1d(h, ru["w2"], ru["b2"])
    return x + h


def encode_latent(params, wav, cfg: CodecConfig):
    """wav [B, 1, T*hop] -> latent [B, D, T]."""
    enc = params["encoder"]
    x = conv1d(wav, enc["enc_in_w"], enc["enc_in_b"])
    for block, r in zip(enc["enc_blocks"], cfg.encoder_strides):
        for ru, dil in zip(block["res"], ENC_RES_DILATIONS):
            x = _res_unit(x, ru, dil)
        x = _elu(x)
        x = conv1d(x, block["down_w"], block["down_b"], stride=r)
    x = _elu(x)
    return conv1d(x, enc["enc_out_w"], enc["enc_out_b"])


def rvq_quantize(params, lat):
    """Residual VQ: latent [B, D, T] -> codes [B, NB, T]."""
    cb = params["encoder"]["codebooks"]  # [NB, V, D]
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


def codec_encode(params, wav, cfg: CodecConfig):
    """wav [B, samples] -> codes [B, NB, T] (samples truncated to hop grid)."""
    return rvq_quantize(params, encode_latent(params, wav[:, None, :], cfg))


# ---------------------------------------------------------------------------
# SpeechTokenizer wrapper (API parity with utils/audio.py SpeechTokenizer)
# ---------------------------------------------------------------------------

# Decode-length buckets (strictly greater than T). 5/9/13 are the server's
# streaming windows (first chunks T=4/8, inner T=chunk 4 + context 8 = 12):
# a 13-bucket instead of 16 cuts ~19% off every inner-window decode.
_LENGTH_BUCKETS = (5, 9, 13, 16, 24, 32, 64, 128, 256, 360)


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
        if self.cfg.param_dtype != "float32":
            from nano_qwen3tts_tpu.audio.code2wav import (
                cast_decoder_params,
                quantize_decoder_params,
            )

            # ONE jitted transform (eagerly this is hundreds of tiny device
            # ops — minutes through a remote relay, see engine.py _prepare)
            xf = (
                quantize_decoder_params
                if self.cfg.param_dtype == "int8"
                else lambda p: cast_decoder_params(p, jnp.bfloat16)
            )
            self.params = dict(
                self.params, decoder=jax.jit(xf)(self.params["decoder"])
            )
        self.sample_rate = self.cfg.sample_rate
        cdt = jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32

        def _decode(params, codes):
            return codec_decode(params, codes, self.cfg, compute_dtype=cdt)

        self._decode_jit = jax.jit(_decode)

        def _decode_pcm16(params, codes):
            wav = codec_decode(params, codes, self.cfg, compute_dtype=cdt)
            return jnp.round(
                jnp.clip(wav, -1.0, 1.0) * 32767.0
            ).astype(jnp.int16)

        # int16 on device: halves the device->host transfer for streaming
        self._decode_pcm16_jit = jax.jit(_decode_pcm16)

        def _encode(params, wav):
            return codec_encode(params, wav, self.cfg)

        self._encode_jit = jax.jit(_encode)
        # pooled window-decode programs, keyed by (Bb, T, ctx, new) —
        # see dispatch_pool_pcm16
        self._pool_fns: dict = {}

    # -- helpers ------------------------------------------------------------

    def _bucket(self, t: int) -> int:
        # STRICTLY greater: the decoder loses a few-hundred-sample tail
        # (out_len(T) = hop*T - c), so >= one pad frame guarantees hop*T
        # valid samples for T real frames.
        for b in _LENGTH_BUCKETS:
            if t < b:
                return b
        return ((t // 360) + 1) * 360

    def _pad_codes(self, arr: np.ndarray, tb: int) -> np.ndarray:
        """Pad [B, NB, T] to T=tb by repeating the final frame (sustained
        audio keeps the one-step-lookahead tail well-conditioned), and pad
        the batch dim to the next power of two (repeat row 0): the server's
        micro-batched decode worker sends whatever batch arrived, and an
        unbucketed batch dim would compile one program per concurrency
        level at serve time (a multi-minute relay stall per new CCU)."""
        B, NB, T = arr.shape
        bb = 1 << max(B - 1, 0).bit_length()
        padded = np.empty((bb, NB, tb), np.int32)
        padded[:B, :, :T] = arr
        padded[:B, :, T:] = arr[:, :, -1:]
        padded[B:] = padded[0]
        return padded

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

    def warmup(
        self, batch_buckets=(1, 2, 4, 8, 16), window_lengths=(4, 12)
    ):
        """Pre-compile the streaming-decode programs for the serving shapes:
        every power-of-two batch bucket the micro-batched decode worker can
        pad to (up to 16 concurrent windows per call), at the server's
        first-chunk and inner-window lengths. The analogue of the
        reference's 50-CUDA-graph codec capture at startup
        (speech_tokenizer_cudagraph.py:18-56) — without it the first
        request at each new concurrency level stalls on a compile.
        Persisted to the compile cache, so only the first server start on a
        machine pays."""
        for b in batch_buckets:
            for t in window_lengths:
                codes = np.zeros((b, self.cfg.num_codebooks, t), np.int32)
                dev, _ = self.dispatch_pcm16(codes)
                np.asarray(dev)

    def decode(self, codes) -> tuple[list[np.ndarray], int]:
        """codes (any accepted form) -> (list of float32 wavs, sample_rate)."""
        arr = self.normalize_codes(codes)
        B, NB, T = arr.shape
        padded = self._pad_codes(arr, self._bucket(T))
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
        padded = self._pad_codes(arr, self._bucket(T))
        dev = self._decode_pcm16_jit(self.params, jnp.asarray(padded))
        try:
            dev.copy_to_host_async()
        except Exception:
            pass
        return dev, T * self.cfg.hop

    # -- pooled streaming decode (device-resident codes) ---------------------

    def _pool_fn(self, Bb: int, T: int, ctx: int, new: int):
        """Jitted program: gather [Bb] windows of T frames from the engine's
        device-resident codes pool, decode, return ONLY the new samples as
        int16 PCM — codes never touch the host and the transfer is the
        trimmed chunk, not the full window."""
        key = (Bb, T, ctx, new)
        fn = self._pool_fns.get(key)
        if fn is not None:
            return fn
        Tb = self._bucket(T)
        hop = self.cfg.hop
        cfg = self.cfg
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        nb = cfg.num_codebooks

        def _decode_pool(params, pool, slots, starts):
            win = jax.vmap(
                lambda s, st: jax.lax.dynamic_slice(
                    pool, (s, st, 0), (1, T, nb)
                )[0]
            )(slots, starts)  # [Bb, T, nb]
            pad = jnp.broadcast_to(win[:, -1:, :], (Bb, Tb - T, nb))
            codes = jnp.concatenate([win, pad], axis=1).transpose(0, 2, 1)
            wav = codec_decode(params, codes, cfg, compute_dtype=cdt)
            pcm = jnp.round(
                jnp.clip(wav, -1.0, 1.0) * 32767.0
            ).astype(jnp.int16)
            return pcm[:, ctx * hop : (ctx + new) * hop]

        fn = jax.jit(_decode_pool)
        self._pool_fns[key] = fn
        return fn

    def dispatch_pool_pcm16(
        self, codes_pool, slots, starts, T: int, ctx: int, new: int
    ):
        """Non-blocking pooled window decode.

        codes_pool: the engine runner's [P, F, 16] int32 device array;
        slots/starts: per-stream pool row + first window frame (frame
        index into the slot's GENERATED frames); T: window frames;
        ctx: left-context frames trimmed on device; new: frames whose
        samples are returned. Returns the device PCM16 array
        [Bb, new*hop] (rows beyond len(slots) are batch padding).
        """
        B = len(slots)
        Bb = 1 << max(B - 1, 0).bit_length()
        sl = np.zeros(Bb, np.int32)
        st = np.zeros(Bb, np.int32)
        sl[:B] = slots
        st[:B] = starts
        fn = self._pool_fn(Bb, T, ctx, new)
        dev = fn(self.params, codes_pool, jnp.asarray(sl), jnp.asarray(st))
        try:
            dev.copy_to_host_async()
        except Exception:
            pass
        return dev

    def warmup_pool(
        self, codes_pool, combos, batch_buckets=(1, 2, 4, 8, 16)
    ):
        """Pre-compile the pooled streaming programs for the server's
        window shapes ((T, ctx, new) combos from its chunk policy) at every
        batch bucket — the pooled-path counterpart of warmup()."""
        for T, ctx, new in combos:
            for b in batch_buckets:
                dev = self.dispatch_pool_pcm16(
                    codes_pool, [0] * b, [0] * b, T, ctx, new
                )
                np.asarray(dev)

    def chunked_decode(
        self, codes, chunk_size: int = 300, left_context: int = 25
    ) -> tuple[list[np.ndarray], int]:
        """Overlap-window decode of long sequences (the upstream
        ``Code2Wav.chunked_decode`` policy; also
        speech_tokenizer_cudagraph.py:127-157)."""
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

    # None: fully seeded-random codec (tests/examples — encode allowed);
    # True: real checkpoint included encoder tensors; False: real DECODER
    # checkpoint without an encoder — encode must fail loudly, not emit
    # garbage codes into a voice-clone prompt (CODEC_ARCH.md encoder
    # dossier; the analogue of interface.extract_speaker_embedding's raise).
    encoder_loaded: Optional[bool] = None

    def encode(self, wav: np.ndarray, sr: int = 24000):
        """wav [samples] -> codes [T, NB] int32 (voice-clone reference path,
        utils/audio.py:82-123)."""
        if self.encoder_loaded is False:
            raise RuntimeError(
                "this codec checkpoint has no encoder tensors: the upstream "
                "Qwen3-TTS codec ENCODER architecture has no public "
                "implementation (CODEC_ARCH.md, encoder dossier), so raw "
                "reference audio cannot be encoded faithfully. Voice clone "
                "still works from precomputed reference codes "
                "(create_voice_clone_prompt(..., ref_codes=...)); to encode "
                "raw audio, convert an encoder with "
                "tools/convert_checkpoint.py codec --encoder strict"
            )
        from nano_qwen3tts_tpu.audio.wav import resample

        wav = resample(np.asarray(wav, np.float32), sr, self.sample_rate)
        n = (len(wav) // self.cfg.hop) * self.cfg.hop
        if n == 0:
            raise ValueError("audio shorter than one codec frame")
        codes = np.asarray(self._encode_jit(self.params, jnp.asarray(wav[None, :n])))
        return codes[0].T  # [T, NB]


def load_codec(model_path: str) -> SpeechTokenizer:
    """Load codec weights from <model_path>/codec.safetensors if present,
    else seeded random weights of the same (real) decoder architecture.

    Serving default is float32 decode compute: with the real Code2Wav
    architecture the decode stack is deep enough that bf16 fidelity can
    only be judged against REAL weights (random weights saturate the head
    and amplify chaotically — ~26% relative RMS, meaningless either way).
    CODEC_COMPUTE_DTYPE=bfloat16 opts into the faster path once real
    weights exist to validate it."""
    import os

    path = os.path.join(model_path, "codec.safetensors")
    cdt = os.environ.get("CODEC_COMPUTE_DTYPE", "float32")
    if cdt not in ("float32", "bfloat16"):
        # near-miss spellings ('bf16', 'fp32') would otherwise silently
        # select the wrong compute path (ADVICE r1)
        raise ValueError(
            f"CODEC_COMPUTE_DTYPE={cdt!r}: use 'float32' or 'bfloat16'"
        )
    pdt = os.environ.get("CODEC_PARAM_DTYPE", "float32")
    if pdt not in ("float32", "bfloat16", "int8"):
        raise ValueError(
            f"CODEC_PARAM_DTYPE={pdt!r}: use 'float32', 'bfloat16' or 'int8'"
        )
    cfg = CodecConfig(compute_dtype=cdt, param_dtype=pdt)
    if os.path.exists(path):
        from safetensors import safe_open

        flat = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                flat[k] = f.get_tensor(k)
        has_encoder = any(k.startswith("encoder.") for k in flat)
        params = _unflatten(flat, cfg)
        st = SpeechTokenizer(cfg, params)
        # Decoder-only checkpoints are the expected real-world form (the
        # upstream encoder architecture is unknowable offline, CODEC_ARCH.md
        # encoder dossier): everything except encode-from-raw-audio works.
        st.encoder_loaded = has_encoder
        return st
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


def flatten_codec_params(params: dict, cfg: Optional[CodecConfig] = None) -> dict:
    """-> {name: array} for safetensors serialization.

    Decoder tensors are emitted under the UPSTREAM torch names and layouts
    (torch_name_map) so codec.safetensors IS a torch-layout Code2Wav state
    dict; encoder tensors go under an ``encoder.`` prefix with this repo's
    dotted-path names."""
    import jax.tree_util as jtu

    cfg = cfg or CodecConfig()
    # forward layouts (code2wav._apply_layout) are pure transposes; invert
    back = {
        "id": lambda a: a,
        "t": lambda a: a.T,
        "c": lambda a: np.transpose(a, (2, 1, 0)),
        "tc": lambda a: np.transpose(a, (1, 2, 0)),
        "dw": lambda a: np.transpose(a, (1, 0))[:, None, :],
    }
    out = {}
    dec = params["decoder"]
    for name, (path, how) in torch_name_map(cfg.code2wav()).items():
        node = dec
        for p in path:
            node = node[p]
        # ascontiguousarray is LOAD-BEARING: the layout inversions above are
        # numpy transpose VIEWS, and safetensors serializes the underlying
        # buffer without honoring strides — a non-contiguous array saves
        # silently scrambled (verified).
        out[name] = np.ascontiguousarray(back[how](np.asarray(node)))
    leaves = jtu.tree_flatten_with_path(params["encoder"])[0]
    for path, leaf in leaves:
        out["encoder." + _param_key(path)] = np.asarray(leaf)
    return out


def _unflatten(flat: dict, cfg: Optional[CodecConfig] = None) -> dict:
    """Rebuild the params pytree from a codec.safetensors mapping: decoder
    via the upstream-name state dict (fail-loud), encoder via the init
    template."""
    import jax.tree_util as jtu

    cfg = cfg or CodecConfig()
    dec_sd = {k: v for k, v in flat.items() if not k.startswith("encoder.")}
    decoder = from_torch_state_dict(dec_sd, cfg.code2wav())
    template = init_encoder_params(cfg, jax.random.PRNGKey(0))
    if not any(k.startswith("encoder.") for k in flat):
        # decoder-only checkpoint (the expected real-world form; the
        # upstream encoder is unknowable offline — CODEC_ARCH.md): keep the
        # seeded template so decode paths work; SpeechTokenizer.encode
        # fail-louds via encoder_loaded=False (load_codec sets it).
        return {"decoder": decoder, "encoder": template}
    leaves, _ = jtu.tree_flatten_with_path(template)
    new_leaves = []
    for path, leaf in leaves:
        key = "encoder." + _param_key(path)
        new_leaves.append(jnp.asarray(flat[key]))
    encoder = jtu.tree_unflatten(jtu.tree_structure(template), new_leaves)
    return {"decoder": decoder, "encoder": encoder}
