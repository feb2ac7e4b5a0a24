"""Shared decoder-stack building blocks (pure functions over param pytrees).

Implements the Qwen3-TTS decoder layer semantics (reference
models/qwen3_tts_share.py:13-176): pre-norm residual blocks with separate
q/k/v/o projections, per-head QK-RMSNorm when there is no QKV bias
(qwen3_tts_share.py:75-77,96-97), 1-D RoPE (the reference's 3-D mrope
collapses to 1-D because positions are a broadcast single axis — see
TalkerConfig.attention_scaling), and SwiGLU MLPs.

Design notes (TPU-first):
* Parameters are plain pytrees of jnp arrays; layer weights are *stacked*
  along a leading layer axis and the stack runs under ``lax.scan`` — one
  compiled layer body instead of N inlined layers (fast compiles, identical
  math). Linear weights are stored ``[in, out]`` so application is
  ``x @ w`` (checkpoint tensors are transposed once at load time,
  models/weights.py).
* RMSNorm matches the reference bit-for-bit in structure: compute in f32,
  cast back to the input dtype *before* multiplying by the (bf16) weight
  (layers/layernorm.py:17-27).
* All matmuls run in bf16 with f32 accumulation (``preferred_element_type``),
  matching flash-attn / torch.compile behaviour on the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from nano_qwen3tts_tpu.ops.attention import (
    dense_decode_attention,
    dense_prefill_attention,
    paged_decode_attention,
)
from nano_qwen3tts_tpu.ops.kv_cache import write_kv


@dataclass(frozen=True)
class AttnSpec:
    """Static attention configuration (hashable; safe as a jit constant)."""

    num_heads: int
    num_kv_heads: int
    head_dim: int
    rms_norm_eps: float
    rope_theta: float
    attention_scaling: float = 1.0
    qkv_bias: bool = False
    # Statically unroll the layer loop instead of lax.scan: scan slices each
    # layer's weights into a fresh buffer per iteration, DOUBLING weight HBM
    # traffic in the decode hot path; unrolled static slices fuse into the
    # dots. Costs compile time — enable for serving, keep False for tests.
    unroll: bool = False

    @property
    def scale(self) -> float:
        return self.head_dim ** -0.5

    @classmethod
    def from_model_config(cls, mc) -> "AttnSpec":
        head_dim = getattr(mc, "actual_head_dim", None) or mc.head_dim
        scaling = getattr(mc, "attention_scaling", 1.0)
        if not isinstance(scaling, float):
            scaling = 1.0
        return cls(
            num_heads=mc.num_attention_heads,
            num_kv_heads=mc.num_key_value_heads,
            head_dim=head_dim,
            rms_norm_eps=mc.rms_norm_eps,
            rope_theta=float(mc.rope_theta),
            attention_scaling=scaling,
            qkv_bias=mc.attention_bias,
        )


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """f32 RMS norm; cast back before the weight multiply (layernorm.py:17-27)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return xf.astype(orig) * w


def linear(x: jax.Array, w, b: Optional[jax.Array] = None) -> jax.Array:
    """Matmul with transparent int8 dispatch (w may be a quantized dict)."""
    if not isinstance(w, jax.Array):
        from nano_qwen3tts_tpu.ops.quant import quantized_linear

        y = quantized_linear(x, w)
    else:
        y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def swiglu_mlp(lp: dict, x: jax.Array) -> jax.Array:
    """SwiGLU MLP (qwen3_tts_share.py:116-135)."""
    if "gateup_w" in lp:
        gateup = linear(x, lp["gateup_w"])
        gate, up = jnp.split(gateup, 2, axis=-1)
    else:
        gate = linear(x, lp["gate_w"])
        up = linear(x, lp["up_w"])
    return linear(jax.nn.silu(gate) * up, lp["down_w"])


def make_inv_freq(head_dim: int, theta: float) -> jax.Array:
    return 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )


def apply_rope(
    x: jax.Array,  # [..., T, H, d]
    positions: jax.Array,  # [..., T] int32
    inv_freq: jax.Array,  # [d/2] f32
    scaling: float,
) -> jax.Array:
    """Non-interleaved RoPE (rotate_half formulation, rotary_embedding.py:5-35).

    cos/sin computed in f32, scaled by ``attention_scaling``, cast to x dtype
    before the rotation — matching the reference numerics exactly.
    """
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, d/2]
    cos = (jnp.cos(freqs) * scaling).astype(x.dtype)[..., None, :]  # [..., T, 1, d/2]
    sin = (jnp.sin(freqs) * scaling).astype(x.dtype)[..., None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


def fuse_layer_stack(layers: dict) -> dict:
    """Horizontally fuse q/k/v -> qkv_w and gate/up -> gateup_w (one matmul
    each). This is the load-time realization of the reference's
    QKVParallelLinear / MergedColumnParallelLinear (layers/linear.py:76-128),
    which fuse the same projections at weight-load; here the fusion also
    halves kernel dispatches in the latency-bound decode step. Call BEFORE
    quantization (per-output-channel int8 scales survive concatenation)."""
    out = dict(layers)
    out["qkv_w"] = jnp.concatenate(
        [out.pop("q_w"), out.pop("k_w"), out.pop("v_w")], axis=-1
    )
    if "q_b" in out:
        out["qkv_b"] = jnp.concatenate(
            [out.pop("q_b"), out.pop("k_b"), out.pop("v_b")], axis=-1
        )
    out["gateup_w"] = jnp.concatenate(
        [out.pop("gate_w"), out.pop("up_w")], axis=-1
    )
    return out


def project_qkv(lp: dict, x: jax.Array, spec: AttnSpec):
    """x [..., D] -> q [..., Hq, d], k/v [..., Hkv, d] with QK-norm or bias."""
    if "qkv_w" in lp:
        qkv = linear(x, lp["qkv_w"], lp.get("qkv_b"))
        nq, nkv = spec.num_heads * spec.head_dim, spec.num_kv_heads * spec.head_dim
        q = qkv[..., :nq]
        k = qkv[..., nq : nq + nkv]
        v = qkv[..., nq + nkv :]
    else:
        q = linear(x, lp["q_w"], lp.get("q_b"))
        k = linear(x, lp["k_w"], lp.get("k_b"))
        v = linear(x, lp["v_w"], lp.get("v_b"))
    q = q.reshape(*x.shape[:-1], spec.num_heads, spec.head_dim)
    k = k.reshape(*x.shape[:-1], spec.num_kv_heads, spec.head_dim)
    v = v.reshape(*x.shape[:-1], spec.num_kv_heads, spec.head_dim)
    if not spec.qkv_bias:  # per-head QK-RMSNorm (qwen3_tts_share.py:96-97)
        q = rms_norm(q, lp["q_norm"], spec.rms_norm_eps)
        k = rms_norm(k, lp["k_norm"], spec.rms_norm_eps)
    return q, k, v


# ---------------------------------------------------------------------------
# Decoder stacks (lax.scan over stacked layer params)
# ---------------------------------------------------------------------------


def stack_prefill(
    layers: dict,  # stacked layer params, leading dim L
    norm_w: jax.Array,
    x: jax.Array,  # [B, T, D] input embeddings
    positions: jax.Array,  # [B, T] int32
    valid: jax.Array,  # [B, T] bool
    slots: jax.Array,  # [B*T] int32 flat KV slots (garbage for pads)
    k_cache: jax.Array,  # [L, S, Hkv, d]
    v_cache: jax.Array,
    spec: AttnSpec,
):
    """Dense padded prefill; writes KV to the paged cache.

    Returns (hidden [B, T, D], k_cache, v_cache). ``hidden`` is final-norm
    output (the talker feeds its last-token hidden to the predictor,
    interface.py:1243-1252).
    """
    B, T, D = x.shape
    inv_freq = make_inv_freq(spec.head_dim, spec.rope_theta)

    def body(h, per_layer):
        lp, kc_l, vc_l = per_layer
        xn = rms_norm(h, lp["input_layernorm"], spec.rms_norm_eps)
        q, k, v = project_qkv(lp, xn, spec)
        q = apply_rope(q, positions, inv_freq, spec.attention_scaling)
        k = apply_rope(k, positions, inv_freq, spec.attention_scaling)
        kc_l, vc_l = write_kv(
            kc_l,
            vc_l,
            k.reshape(B * T, spec.num_kv_heads, spec.head_dim),
            v.reshape(B * T, spec.num_kv_heads, spec.head_dim),
            slots,
        )
        attn = dense_prefill_attention(q, k, v, valid, spec.scale)
        attn = attn.reshape(B, T, spec.num_heads * spec.head_dim)
        h = h + linear(attn, lp["o_w"])
        xn2 = rms_norm(h, lp["post_attention_layernorm"], spec.rms_norm_eps)
        h = h + swiglu_mlp(lp, xn2)
        return h, (kc_l, vc_l)

    h, (k_cache, v_cache) = jax.lax.scan(body, x, (layers, k_cache, v_cache))
    return rms_norm(h, norm_w, spec.rms_norm_eps), k_cache, v_cache


def write_kv_rows_deferred(k_cache, v_cache, k_rows, v_rows, slots):
    """Scatter per-layer new KV rows ([L, B, Hkv, d]) into the paged cache
    with per-lane dynamic-update-slices (the deferred-write tail of
    stack_decode_paged, shared with the Pallas talker burst path)."""
    from nano_qwen3tts_tpu.ops.kv_cache import QuantizedKV, quantize_kv_rows

    B = k_rows.shape[1]
    if isinstance(k_cache, QuantizedKV):
        kq, ks = quantize_kv_rows(k_rows)  # [L,B,Hkv,d] -> int8 + [L,B]
        vq, vs = quantize_kv_rows(v_rows)
        L = kq.shape[0]
        kq = kq.reshape(L, B, -1)  # flat cache minor dim (see QuantizedKV)
        vq = vq.reshape(L, B, -1)
        for i in range(B):
            k_cache = QuantizedKV(
                jax.lax.dynamic_update_slice(
                    k_cache.q, kq[:, i : i + 1], (0, slots[i], 0)
                ),
                jax.lax.dynamic_update_slice(
                    k_cache.s, ks[:, i : i + 1], (0, slots[i])
                ),
            )
            v_cache = QuantizedKV(
                jax.lax.dynamic_update_slice(
                    v_cache.q, vq[:, i : i + 1], (0, slots[i], 0)
                ),
                jax.lax.dynamic_update_slice(
                    v_cache.s, vs[:, i : i + 1], (0, slots[i])
                ),
            )
        return k_cache, v_cache
    k_rows = k_rows.astype(k_cache.dtype)
    v_rows = v_rows.astype(v_cache.dtype)
    for i in range(B):
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k_rows[:, i : i + 1], (0, slots[i], 0, 0)
        )
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v_rows[:, i : i + 1], (0, slots[i], 0, 0)
        )
    return k_cache, v_cache


def stack_decode_paged(
    layers: dict,
    norm_w: jax.Array,
    x: jax.Array,  # [B, D] one token per sequence
    positions: jax.Array,  # [B] int32 RoPE positions
    slots: jax.Array,  # [B] int32 flat KV write slots
    block_tables: jax.Array,  # [B, NB] int32
    kv_lens: jax.Array,  # [B] int32 valid entries incl. this write
    k_cache: jax.Array,  # [L, S, Hkv, d]
    v_cache: jax.Array,
    spec: AttnSpec,
    block_size: int,
    attn_impl: str = "xla",
):
    """Single-token decode with paged attention. Returns (hidden [B,D], caches).

    Cache-copy-free structure: the layer scan treats the stacked KV cache as
    a LOOP-INVARIANT operand — each layer attends over the existing entries
    plus the current token's K/V held in registers (attend-with-extension,
    ops/paged_attention_pallas.py), and all layers' new rows are written
    after the scan with per-lane dynamic-update-slices. Slicing the cache
    per layer (scan xs/ys) or scattering into a scan carry both materialize
    multi-MB cache copies per layer — measured at 3x-30x the attention
    kernel's own cost on TPU.
    """
    inv_freq = make_inv_freq(spec.head_dim, spec.rope_theta)
    L = k_cache.shape[0]
    B = x.shape[0]
    n_exist = kv_lens - 1  # entries already in the cache

    from nano_qwen3tts_tpu.ops.kv_cache import QuantizedKV, quantize_kv_rows

    int8_kv = isinstance(k_cache, QuantizedKV)
    if attn_impl == "pallas":
        if int8_kv:
            from nano_qwen3tts_tpu.ops.paged_attention_pallas import (
                paged_decode_attention_extend_int8 as _attend,
            )
        else:
            from nano_qwen3tts_tpu.ops.paged_attention_pallas import (
                paged_decode_attention_extend as _attend,
            )
    else:
        if int8_kv:
            from nano_qwen3tts_tpu.ops.paged_attention_pallas import (
                paged_decode_attention_extend_int8_xla as _attend,
            )
        else:
            from nano_qwen3tts_tpu.ops.paged_attention_pallas import (
                paged_decode_attention_extend_xla as _attend,
            )

    def body(h, per_layer):
        lp, l = per_layer
        xn = rms_norm(h, lp["input_layernorm"], spec.rms_norm_eps)
        q, k, v = project_qkv(lp, xn[:, None, :], spec)  # [B,1,H,d]
        pos = positions[:, None]
        q = apply_rope(q, pos, inv_freq, spec.attention_scaling)[:, 0]
        k = apply_rope(k, pos, inv_freq, spec.attention_scaling)[:, 0]
        v = v[:, 0]
        attn = _attend(
            q, k, v, k_cache, v_cache, l, block_tables, n_exist,
            block_size, spec.scale,
        )
        attn = attn.reshape(B, spec.num_heads * spec.head_dim)
        h = h + linear(attn, lp["o_w"])
        xn2 = rms_norm(h, lp["post_attention_layernorm"], spec.rms_norm_eps)
        h = h + swiglu_mlp(lp, xn2)
        return h, (k, v)

    if spec.unroll:
        h = x
        ks, vs = [], []
        for l in range(L):
            lp = {k: w[l] for k, w in layers.items()}
            h, (k_l, v_l) = body(h, (lp, jnp.int32(l)))
            ks.append(k_l)
            vs.append(v_l)
        k_rows, v_rows = jnp.stack(ks), jnp.stack(vs)
    else:
        h, (k_rows, v_rows) = jax.lax.scan(
            body, x, (layers, jnp.arange(L, dtype=jnp.int32))
        )
    # deferred KV writes: [L, B, Hkv, d] rows -> per-lane dynamic-update-slice
    k_cache, v_cache = write_kv_rows_deferred(
        k_cache, v_cache, k_rows, v_rows, slots
    )
    return rms_norm(h, norm_w, spec.rms_norm_eps), k_cache, v_cache


def stack_prefill_dense_cache(
    layers: dict,
    norm_w: jax.Array,
    x: jax.Array,  # [B, T, D]
    positions: jax.Array,  # [B, T]
    k_ctx: jax.Array,  # [L, B, W, Hkv, d] dense per-seq KV buffer (carried)
    v_ctx: jax.Array,
    spec: AttnSpec,
):
    """Prefill writing into a dense carried KV buffer (predictor path).

    The predictor's whole 17-token lifetime fits in a [B, 17, Hkv, d] buffer
    carried through the frame scan — no paged cache, no scheduler
    (replaces the reference's separate predictor engine/worker).
    Returns (hidden [B, T, D], k_ctx, v_ctx).
    """
    B, T, D = x.shape
    inv_freq = make_inv_freq(spec.head_dim, spec.rope_theta)

    def body(h, per_layer):
        lp, kc_l, vc_l = per_layer
        xn = rms_norm(h, lp["input_layernorm"], spec.rms_norm_eps)
        q, k, v = project_qkv(lp, xn, spec)
        q = apply_rope(q, positions, inv_freq, spec.attention_scaling)
        k = apply_rope(k, positions, inv_freq, spec.attention_scaling)
        kc_l = jax.lax.dynamic_update_slice(kc_l, k.astype(kc_l.dtype), (0, 0, 0, 0))
        vc_l = jax.lax.dynamic_update_slice(vc_l, v.astype(vc_l.dtype), (0, 0, 0, 0))
        valid = jnp.ones((B, T), dtype=bool)
        attn = dense_prefill_attention(q, k, v, valid, spec.scale)
        attn = attn.reshape(B, T, spec.num_heads * spec.head_dim)
        h = h + linear(attn, lp["o_w"])
        xn2 = rms_norm(h, lp["post_attention_layernorm"], spec.rms_norm_eps)
        h = h + swiglu_mlp(lp, xn2)
        return h, (kc_l, vc_l)

    h, (k_ctx, v_ctx) = jax.lax.scan(body, x, (layers, k_ctx, v_ctx))
    return rms_norm(h, norm_w, spec.rms_norm_eps), k_ctx, v_ctx


def stack_decode_dense_cache(
    layers: dict,
    norm_w: jax.Array,
    x: jax.Array,  # [B, D]
    position: jax.Array,  # scalar int32 — same position for all lanes
    k_ctx: jax.Array,  # [L, B, W, Hkv, d]
    v_ctx: jax.Array,
    spec: AttnSpec,
):
    """Single-token decode against the dense carried KV buffer (predictor).

    Writes the new KV at ``position`` and attends over entries < position+1.
    Returns (hidden [B, D], k_ctx, v_ctx).
    """
    B = x.shape[0]
    inv_freq = make_inv_freq(spec.head_dim, spec.rope_theta)
    kv_lens = jnp.full((B,), position + 1, dtype=jnp.int32)

    def body(h, per_layer):
        lp, kc_l, vc_l = per_layer
        xn = rms_norm(h, lp["input_layernorm"], spec.rms_norm_eps)
        q, k, v = project_qkv(lp, xn[:, None, :], spec)
        pos = jnp.full((B, 1), position, dtype=jnp.int32)
        q = apply_rope(q, pos, inv_freq, spec.attention_scaling)[:, 0]
        k = apply_rope(k, pos, inv_freq, spec.attention_scaling)
        kc_l = jax.lax.dynamic_update_slice(
            kc_l, k.astype(kc_l.dtype), (0, position, 0, 0)
        )
        vc_l = jax.lax.dynamic_update_slice(
            vc_l, v[:, :1].astype(vc_l.dtype), (0, position, 0, 0)
        )
        attn = dense_decode_attention(q, kc_l, vc_l, kv_lens, spec.scale)
        attn = attn.reshape(B, spec.num_heads * spec.head_dim)
        h = h + linear(attn, lp["o_w"])
        xn2 = rms_norm(h, lp["post_attention_layernorm"], spec.rms_norm_eps)
        h = h + swiglu_mlp(lp, xn2)
        return h, (kc_l, vc_l)

    if spec.unroll:
        L = k_ctx.shape[0]
        h = x
        kcs, vcs = [], []
        for l in range(L):
            lp = {k_: w[l] for k_, w in layers.items()}
            h, (kc_l, vc_l) = body(h, (lp, k_ctx[l], v_ctx[l]))
            kcs.append(kc_l)
            vcs.append(vc_l)
        k_ctx, v_ctx = jnp.stack(kcs), jnp.stack(vcs)
    else:
        h, (k_ctx, v_ctx) = jax.lax.scan(body, x, (layers, k_ctx, v_ctx))
    return rms_norm(h, norm_w, spec.rms_norm_eps), k_ctx, v_ctx
