"""Code2Wav: the Qwen3-TTS codec decoder architecture, in JAX.

Replaces this repo's former independent SEANet decoder with the REAL
architecture of the Qwen codec-decoder family, transcribed from the public
``transformers`` implementation of Qwen3-Omni's code-to-wav module
(``transformers/models/qwen3_omni_moe/modeling_qwen3_omni_moe.py``,
classes ``Qwen3OmniMoeCode2Wav*``, transformers 4.57). Evidence this is the
Qwen3-TTS speech-tokenizer decoder's architecture family (CODEC_ARCH.md has
the full dossier):

* the reference's codec wrapper calls ``chunked_decode(chunk_size=300,
  left_context_size=25)`` (reference utils/speech_tokenizer_cudagraph.py:
  127-157) — the exact method + defaults of ``Qwen3OmniMoeCode2Wav``;
* 16 codebooks of 2048 entries (= talker codec vocab), decoder input
  ``[B, 16, T]`` — identical contract;
* total upsampling 8*5*4*3 * 2*2 = 1920 samples / frame @ 24 kHz = the
  12.5 Hz frame rate of the Qwen3-TTS "12Hz" tokenizer.

Structure (faithful; all convs causal via left-pad):

  codes [B,16,T] --(one embedding table [16*2048, H], MEAN over books)-->
  pre_transformer (8 layers, hidden 1024, 16 heads, sliding window 72,
                   SwiGLU 3072, RMSNorm, RoPE, LayerScale 0.01) -->
  upsample x2 (causal transconv k=s=2 + ConvNeXt block) -->
  decoder head: conv(H->1536,k7) ->
    4x [SnakeBeta -> transconv(k=2r, s=r, trim r|r) ->
        3x residual unit (SnakeBeta/conv k7 dil 1,3,9/SnakeBeta/conv k1)]
    (channels 1536->768->384->192->96, rates 8,5,4,3) ->
  SnakeBeta -> conv(96->1, k7) -> clamp(-1,1)

Output length for T input frames is ``1920*T - 555`` (the decoder-head
transposed convs trim ``kernel-stride`` on BOTH sides, so each block peeks
one input step ahead and loses one: (T_in-1)*r samples out). The
SpeechTokenizer wrapper pads codes to a strictly-larger bucket so at least
``1920*T`` samples are always valid.

Weight layout note: parameters are stored in a pytree whose leaves keep
MXU-friendly layouts ([in, out] matmul weights, channels-last conv taps);
``from_torch_state_dict`` maps the upstream torch names/layouts (the
converter schema in tools/convert_checkpoint.py uses those names verbatim,
so a real checkpoint converts mechanically). Numerics are pinned against
the torch implementation in tests/test_code2wav_parity.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

RES_DILATIONS = (1, 3, 9)


@dataclass(frozen=True)
class Code2WavConfig:
    """Mirrors transformers Qwen3OmniMoeCode2WavConfig (defaults identical)."""

    codebook_size: int = 2048
    num_quantizers: int = 16
    hidden_size: int = 1024
    num_hidden_layers: int = 8
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    intermediate_size: int = 3072
    sliding_window: int = 72
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    layer_scale_initial_scale: float = 0.01
    decoder_dim: int = 1536
    upsample_rates: tuple = (8, 5, 4, 3)
    upsampling_ratios: tuple = (2, 2)
    sample_rate: int = 24000

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def total_upsample(self) -> int:
        n = 1
        for r in self.upsample_rates + self.upsampling_ratios:
            n *= r
        return n  # 1920 -> 12.5 Hz at 24 kHz

    def out_len(self, t: int) -> int:
        """Decoded samples for t input frames (loses one input step per
        decoder-head block: the k=2r/s=r transconvs trim r on both sides)."""
        n = t
        for r in self.upsampling_ratios:
            n *= r
        for r in self.upsample_rates:
            n = (n - 1) * r
        return n


# ---------------------------------------------------------------------------
# primitives (channels-last [B, T, C]; MXU-formulated — see audio/codec.py's
# measured rationale: im2col/shifted-dot matmuls keep the MXU fed where
# small-channel NCT convs run it at <1%)
# ---------------------------------------------------------------------------


def causal_conv(x, w, b, dilation: int = 1):
    """CausalConvNet, stride 1: left-pad (k-1)*d. x [B,T,C], w [K,I,O]."""
    k = w.shape[0]
    if k == 1:
        y = x @ w[0]
        return y if b is None else y + b
    pad = (k - 1) * dilation
    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    T = x.shape[1]
    y = None
    for j in range(k):
        yj = xp[:, j * dilation : j * dilation + T, :] @ w[j]
        y = yj if y is None else y + yj
    return y if b is None else y + b


def depthwise_causal_conv(x, w, b):
    """groups=C causal conv (ConvNeXt dwconv). x [B,T,C], w [K,C]."""
    k = w.shape[0]
    pad = k - 1
    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    T = x.shape[1]
    y = None
    for j in range(k):
        yj = xp[:, j : j + T, :] * w[j][None, None, :]
        y = yj if y is None else y + yj
    return y + b


def transconv_eq(x, w, b, r: int):
    """kernel == stride == r transposed conv: y[a*r+j] = x[a] @ w[j] + b.
    x [B,T,I], w [r,I,O]."""
    B, T, I = x.shape
    O = w.shape[-1]
    y = jnp.einsum("bti,rio->btro", x, w).reshape(B, T * r, O)
    return y + b


def transconv_trim(x, w, b, r: int):
    """CausalTransConvNet with kernel 2r, stride r, trimmed (k-s) on BOTH
    sides (the decoder-head blocks): y[a*r+j] = x[a] @ w[r+j] + x[a+1] @ w[j]
    for a in [0, T-2] -> [B, (T-1)*r, O]. x [B,T,I], w [2r,I,O]."""
    B, T, I = x.shape
    O = w.shape[-1]
    ya = jnp.einsum("bti,rio->btro", x[:, :-1], w[r:])
    yb = jnp.einsum("bti,rio->btro", x[:, 1:], w[:r])
    return (ya + yb).reshape(B, (T - 1) * r, O) + b


def snake_beta(x, alpha, beta):
    """SnakeBeta: x + (1/(e^beta + 1e-9)) * sin^2(x * e^alpha)."""
    a = jnp.exp(alpha)[None, None, :]
    b = jnp.exp(beta)[None, None, :]
    s = jnp.sin(x * a)
    return x + (1.0 / (b + 1e-9)) * s * s


def rms_norm(x, g, eps):
    xf = x.astype(jnp.float32)
    v = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (g * (xf * jax.lax.rsqrt(v + eps)).astype(x.dtype)).astype(x.dtype)


def layer_norm(x, g, b, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def _rope_cos_sin(T, head_dim, theta, dtype):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    pos = np.arange(T)[:, None] * inv[None, :]  # [T, hd/2]
    emb = np.concatenate([pos, pos], axis=-1)
    return (
        jnp.asarray(np.cos(emb), dtype),
        jnp.asarray(np.sin(emb), dtype),
    )


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _attention(x, lp, cfg: Code2WavConfig, cos, sin, mask):
    """One sliding-window causal attention layer. x [B,T,H]."""
    B, T, H = x.shape
    nh, hd = cfg.num_attention_heads, cfg.head_dim
    q = (x @ lp["q_w"]).reshape(B, T, nh, hd)
    k = (x @ lp["k_w"]).reshape(B, T, cfg.num_key_value_heads, hd)
    v = (x @ lp["v_w"]).reshape(B, T, cfg.num_key_value_heads, hd)
    q = q * cos[None, :, None, :] + _rotate_half(q) * sin[None, :, None, :]
    k = k * cos[None, :, None, :] + _rotate_half(k) * sin[None, :, None, :]
    if cfg.num_key_value_heads != nh:
        rep = nh // cfg.num_key_value_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
    logits = jnp.where(mask[None, None], logits, jnp.finfo(logits.dtype).min)
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, T, nh * hd)
    return o @ lp["o_w"]


def pre_transformer(params, x, cfg: Code2WavConfig):
    """The 8-layer sliding-window causal transformer over codec frames."""
    T = x.shape[1]
    cos, sin = _rope_cos_sin(T, cfg.head_dim, cfg.rope_theta, x.dtype)
    q_idx = np.arange(T)[:, None]
    k_idx = np.arange(T)[None, :]
    mask = jnp.asarray(
        (k_idx <= q_idx) & (q_idx - k_idx < cfg.sliding_window)
    )
    for lp in params["layers"]:
        h = rms_norm(x, lp["input_ln"], cfg.rms_norm_eps)
        h = _attention(h, lp, cfg, cos, sin, mask)
        x = x + lp["attn_scale"] * h
        h = rms_norm(x, lp["post_ln"], cfg.rms_norm_eps)
        h = (jax.nn.silu(h @ lp["gate_w"]) * (h @ lp["up_w"])) @ lp["down_w"]
        x = x + lp["mlp_scale"] * h
    return rms_norm(x, params["norm"], cfg.rms_norm_eps)


def convnext_block(x, p):
    """ConvNeXt: dwconv k7 -> LN(1e-6) -> pw 4x GELU pw -> gamma, residual."""
    h = depthwise_causal_conv(x, p["dw_w"], p["dw_b"])
    h = layer_norm(h, p["ln_g"], p["ln_b"])
    h = h @ p["pw1_w"] + p["pw1_b"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["pw2_w"] + p["pw2_b"]
    return x + p["gamma"] * h


def residual_unit(x, p, dilation: int):
    h = snake_beta(x, p["a1"], p["be1"])
    h = causal_conv(h, p["w1"], p["b1"], dilation=dilation)
    h = snake_beta(h, p["a2"], p["be2"])
    h = causal_conv(h, p["w2"], p["b2"])
    return x + h


def _is_q8(x) -> bool:
    return isinstance(x, dict) and "q8" in x


def _cast(a, compute_dtype):
    """Cast a leaf to the compute dtype; int8 weight-only leaves ({q8, s},
    see quantize_decoder_params) dequantize here — XLA reads the int8
    bytes from HBM and fuses the scale into the consumer, so a
    weight-HBM-bound decode streams 1/4 the bytes of f32."""
    if _is_q8(a):
        return a["q8"].astype(compute_dtype) * a["s"].astype(compute_dtype)
    return a.astype(compute_dtype)


def code2wav_decode(params, codes, cfg: Code2WavConfig,
                    compute_dtype=jnp.float32):
    """codes [B, NQ, T] int32 -> wav [B, out_len(T)] float32."""
    cdt = compute_dtype
    c = lambda a: _cast(a, cdt)  # noqa: E731
    tmap = lambda t: jax.tree.map(c, t, is_leaf=_is_q8)  # noqa: E731
    NQ, V = cfg.num_quantizers, cfg.codebook_size
    offsets = (jnp.arange(NQ, dtype=jnp.int32) * V)[None, :, None]
    ce = params["code_embedding"]
    if _is_q8(ce):  # per-row scales: gather rows THEN scale (never
        idx = codes + offsets  # materialize the dequantized table)
        emb = ce["q8"][idx].astype(jnp.float32) * ce["s"][idx].astype(
            jnp.float32
        )
    else:
        emb = ce[codes + offsets].astype(jnp.float32)  # [B, NQ, T, H]
    x = c(jnp.mean(emb, axis=1))  # [B, T, H]
    x = pre_transformer(tmap(params["pre"]), x, cfg)
    for stage, r in zip(params["upsample"], cfg.upsampling_ratios):
        x = transconv_eq(x, c(stage["up_w"]), c(stage["up_b"]), r)
        x = convnext_block(x, tmap(stage["convnext"]))
    x = causal_conv(x, c(params["dec_in_w"]), c(params["dec_in_b"]))
    for block, r in zip(params["blocks"], cfg.upsample_rates):
        x = snake_beta(x, c(block["a"]), c(block["be"]))
        x = transconv_trim(x, c(block["up_w"]), c(block["up_b"]), r)
        for ru, dil in zip(block["res"], RES_DILATIONS):
            x = residual_unit(x, tmap(ru), dil)
    x = snake_beta(x, c(params["out_a"]), c(params["out_be"]))
    x = causal_conv(x, c(params["out_w"]), c(params["out_b"]))
    return jnp.clip(x[:, :, 0].astype(jnp.float32), -1.0, 1.0)


def quantize_decoder_params(params: dict, min_size: int = 65536) -> dict:
    """Weight-only int8 for the decoder: per-out-channel symmetric scales
    on every large matmul/conv weight (last axis = out channels), per-ROW
    scales on the code embedding table (rows are gathered individually).
    Small tensors (biases, norms, SnakeBeta alphas, LayerScales) stay f32.

    The decode stack at B=1 is weight-HBM-bound (~216M params; see
    PARITY.md codec table), so int8 storage is a bandwidth lever exactly
    like the talker/predictor int8 weights. Fidelity against REAL weights
    is unvalidatable offline (CODEC_ARCH.md assumed #4) — serving default
    stays f32; this is the measured opt-in (CODEC_PARAM_DTYPE=int8)."""

    def q_lastaxis(a):
        red = tuple(range(a.ndim - 1))
        s = jnp.max(jnp.abs(a), axis=red, keepdims=True) / 127.0
        s = jnp.where(s == 0, 1.0, s)
        return {"q8": jnp.round(a / s).astype(jnp.int8), "s": s}

    def q_rows(a):  # [V, H] embedding: per-row
        s = jnp.max(jnp.abs(a), axis=-1, keepdims=True) / 127.0
        s = jnp.where(s == 0, 1.0, s)
        return {"q8": jnp.round(a / s).astype(jnp.int8), "s": s}

    def rec(t, path=()):
        if isinstance(t, dict):
            return {k: rec(v, path + (k,)) for k, v in t.items()}
        if isinstance(t, list):
            return [rec(v, path) for v in t]
        a = jnp.asarray(t)
        if path[-1] == "code_embedding":
            return q_rows(a)
        if a.ndim >= 2 and a.size >= min_size:
            return q_lastaxis(a)
        return a

    return rec(params)


def cast_decoder_params(params: dict, dtype) -> dict:
    """Store decoder weights in ``dtype`` (bf16 halves the HBM stream of
    the weight-bound decode); norm/scale vectors keep f32 range fine."""
    return jax.tree.map(lambda a: jnp.asarray(a).astype(dtype), params)


# ---------------------------------------------------------------------------
# parameter construction + torch checkpoint mapping
# ---------------------------------------------------------------------------


def init_code2wav_params(cfg: Code2WavConfig, key) -> dict:
    ks = iter(jax.random.split(key, 400))
    H, hd = cfg.hidden_size, cfg.head_dim
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    I = cfg.intermediate_size

    def lin(i, o, scale=None):
        s = scale or (1.0 / np.sqrt(i))
        return jax.random.normal(next(ks), (i, o), jnp.float32) * s

    def conv(k, i, o):
        return jax.random.normal(next(ks), (k, i, o), jnp.float32) * (
            1.0 / np.sqrt(i * k)
        )

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append({
            "q_w": lin(H, nh * hd), "k_w": lin(H, nkv * hd),
            "v_w": lin(H, nkv * hd), "o_w": lin(nh * hd, H),
            "gate_w": lin(H, I), "up_w": lin(H, I), "down_w": lin(I, H),
            "input_ln": jnp.ones(H), "post_ln": jnp.ones(H),
            "attn_scale": jnp.full((H,), cfg.layer_scale_initial_scale),
            "mlp_scale": jnp.full((H,), cfg.layer_scale_initial_scale),
        })
    params = {
        "code_embedding": jax.random.normal(
            next(ks), (cfg.num_quantizers * cfg.codebook_size, H), jnp.float32
        ) * 0.02,
        "pre": {"layers": layers, "norm": jnp.ones(H)},
        "upsample": [],
        "dec_in_w": conv(7, H, cfg.decoder_dim),
        "dec_in_b": jnp.zeros(cfg.decoder_dim),
        "blocks": [],
    }
    for r in cfg.upsampling_ratios:
        params["upsample"].append({
            "up_w": conv(r, H, H), "up_b": jnp.zeros(H),
            "convnext": {
                "dw_w": jax.random.normal(next(ks), (7, H), jnp.float32)
                * (1.0 / np.sqrt(7)),
                "dw_b": jnp.zeros(H),
                "ln_g": jnp.ones(H), "ln_b": jnp.zeros(H),
                "pw1_w": lin(H, 4 * H), "pw1_b": jnp.zeros(4 * H),
                "pw2_w": lin(4 * H, H), "pw2_b": jnp.zeros(H),
                "gamma": jnp.full((H,), 1e-6),
            },
        })
    ch = cfg.decoder_dim
    for r in cfg.upsample_rates:
        out = ch // 2
        params["blocks"].append({
            "a": jnp.zeros(ch), "be": jnp.zeros(ch),
            "up_w": conv(2 * r, ch, out), "up_b": jnp.zeros(out),
            "res": [
                {
                    "a1": jnp.zeros(out), "be1": jnp.zeros(out),
                    "w1": conv(7, out, out), "b1": jnp.zeros(out),
                    "a2": jnp.zeros(out), "be2": jnp.zeros(out),
                    "w2": conv(1, out, out), "b2": jnp.zeros(out),
                }
                for _ in RES_DILATIONS
            ],
        })
        ch = out
    params["out_a"] = jnp.zeros(ch)
    params["out_be"] = jnp.zeros(ch)
    params["out_w"] = conv(7, ch, 1)
    params["out_b"] = jnp.zeros(1)
    return params


def torch_name_map(cfg: Code2WavConfig) -> dict:
    """{upstream torch state-dict name: (pytree path, layout transform)}.

    Layouts: torch Linear [O, I] -> ours [I, O] (transpose); torch Conv1d
    [O, I, K] -> ours [K, I, O]; torch ConvTranspose1d [I, O, K] ->
    ours [K, I, O]; depthwise Conv1d [C, 1, K] -> ours [K, C].
    """
    m = {}

    def lin(name, path):
        m[name + ".weight"] = (path, "t")

    m["code_embedding.weight"] = (("code_embedding",), "id")
    for i in range(cfg.num_hidden_layers):
        p = f"pre_transformer.layers.{i}."
        t = ("pre", "layers", i)
        lin(p + "self_attn.q_proj", t + ("q_w",))
        lin(p + "self_attn.k_proj", t + ("k_w",))
        lin(p + "self_attn.v_proj", t + ("v_w",))
        lin(p + "self_attn.o_proj", t + ("o_w",))
        lin(p + "mlp.gate_proj", t + ("gate_w",))
        lin(p + "mlp.up_proj", t + ("up_w",))
        lin(p + "mlp.down_proj", t + ("down_w",))
        m[p + "input_layernorm.weight"] = (t + ("input_ln",), "id")
        m[p + "post_attention_layernorm.weight"] = (t + ("post_ln",), "id")
        m[p + "self_attn_layer_scale.scale"] = (t + ("attn_scale",), "id")
        m[p + "mlp_layer_scale.scale"] = (t + ("mlp_scale",), "id")
    m["pre_transformer.norm.weight"] = (("pre", "norm"), "id")
    for i in range(len(cfg.upsampling_ratios)):
        t = ("upsample", i)
        m[f"upsample.{i}.0.conv.weight"] = (t + ("up_w",), "tc")
        m[f"upsample.{i}.0.conv.bias"] = (t + ("up_b",), "id")
        cn = t + ("convnext",)
        m[f"upsample.{i}.1.dwconv.conv.weight"] = (cn + ("dw_w",), "dw")
        m[f"upsample.{i}.1.dwconv.conv.bias"] = (cn + ("dw_b",), "id")
        m[f"upsample.{i}.1.norm.weight"] = (cn + ("ln_g",), "id")
        m[f"upsample.{i}.1.norm.bias"] = (cn + ("ln_b",), "id")
        lin(f"upsample.{i}.1.pwconv1", cn + ("pw1_w",))
        m[f"upsample.{i}.1.pwconv1.bias"] = (cn + ("pw1_b",), "id")
        lin(f"upsample.{i}.1.pwconv2", cn + ("pw2_w",))
        m[f"upsample.{i}.1.pwconv2.bias"] = (cn + ("pw2_b",), "id")
        m[f"upsample.{i}.1.gamma"] = (cn + ("gamma",), "id")
    m["decoder.0.conv.weight"] = (("dec_in_w",), "c")
    m["decoder.0.conv.bias"] = (("dec_in_b",), "id")
    for i in range(len(cfg.upsample_rates)):
        d = f"decoder.{i + 1}.block."
        t = ("blocks", i)
        m[d + "0.alpha"] = (t + ("a",), "id")
        m[d + "0.beta"] = (t + ("be",), "id")
        m[d + "1.conv.weight"] = (t + ("up_w",), "tc")
        m[d + "1.conv.bias"] = (t + ("up_b",), "id")
        for j in range(len(RES_DILATIONS)):
            r = t + ("res", j)
            m[d + f"{2 + j}.act1.alpha"] = (r + ("a1",), "id")
            m[d + f"{2 + j}.act1.beta"] = (r + ("be1",), "id")
            m[d + f"{2 + j}.conv1.conv.weight"] = (r + ("w1",), "c")
            m[d + f"{2 + j}.conv1.conv.bias"] = (r + ("b1",), "id")
            m[d + f"{2 + j}.act2.alpha"] = (r + ("a2",), "id")
            m[d + f"{2 + j}.act2.beta"] = (r + ("be2",), "id")
            m[d + f"{2 + j}.conv2.conv.weight"] = (r + ("w2",), "c")
            m[d + f"{2 + j}.conv2.conv.bias"] = (r + ("b2",), "id")
    n = len(cfg.upsample_rates) + 1
    m[f"decoder.{n}.alpha"] = (("out_a",), "id")
    m[f"decoder.{n}.beta"] = (("out_be",), "id")
    m[f"decoder.{n + 1}.conv.weight"] = (("out_w",), "c")
    m[f"decoder.{n + 1}.conv.bias"] = (("out_b",), "id")
    return m


def _apply_layout(arr: np.ndarray, how: str) -> np.ndarray:
    if how == "id":
        return arr
    if how == "t":  # Linear [O, I] -> [I, O]
        return arr.T
    if how == "c":  # Conv1d [O, I, K] -> [K, I, O]
        return np.transpose(arr, (2, 1, 0))
    if how == "tc":  # ConvTranspose1d [I, O, K] -> [K, I, O]
        return np.transpose(arr, (2, 0, 1))
    if how == "dw":  # depthwise Conv1d [C, 1, K] -> [K, C]
        return np.transpose(arr[:, 0, :], (1, 0))
    raise ValueError(how)


def _set_path(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def from_torch_state_dict(sd: dict, cfg: Code2WavConfig) -> dict:
    """Build the params pytree from an upstream torch state dict
    ({name: np.ndarray}). Raises on missing tensors (fail-loud converter
    contract, tools/convert_checkpoint.py)."""
    params = init_code2wav_params(cfg, jax.random.PRNGKey(0))
    missing = []
    for name, (path, how) in torch_name_map(cfg).items():
        if name not in sd:
            missing.append(name)
            continue
        _set_path(params, path, jnp.asarray(_apply_layout(
            np.asarray(sd[name], np.float32), how
        )))
    if missing:
        raise ValueError(
            f"code2wav checkpoint is missing {len(missing)} tensors, e.g. "
            f"{missing[:5]} — see tools/convert_checkpoint.py print-schema"
        )
    return params
