"""INT8 quantization for matmul weights (and dynamic activations).

North-star requirement (BASELINE.json): INT8/FP8 weight-only quantization
for the talker and predictor transformers. Two modes:

* ``w8a16`` — weight-only: int8 weights (per-output-channel scales) are
  dequantized to bf16 on the fly inside the matmul fusion. Halves weight
  HBM traffic — the binding resource for small-batch decode.
* ``w8a8``  — weight int8 + *dynamic* per-row activation int8: the matmul
  runs on the MXU's native int8 path (2x bf16 throughput on v5e) and the
  int32 accumulator is rescaled by (row_scale x col_scale).

Both are expressed in XLA (int8 dot_general lowers natively to the MXU);
a Pallas variant is kept for fusing dequant with non-standard epilogues.

A quantized weight is a dict ``{"q": int8 [.., in, out], "s": f32 [.., out]}``
— ``models/transformer.linear`` dispatches on it transparently, so the same
model code serves bf16 and int8 checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class QuantizedWeight:
    """int8 weight + per-output-channel scale; ``mode`` is static pytree aux
    data so it survives jit tracing (strings cannot be leaves)."""

    def __init__(self, q, s, mode: str = "w8a8"):
        self.q = q  # int8 [.., K, N]
        self.s = s  # f32  [.., N]
        self.mode = mode

    def tree_flatten(self):
        return (self.q, self.s), self.mode

    @classmethod
    def tree_unflatten(cls, mode, children):
        return cls(children[0], children[1], mode)

    def __getitem__(self, i):
        return QuantizedWeight(self.q[i], self.s[i], self.mode)

    def index(self, i):
        """dynamic_index along the leading (stack) axis."""
        return QuantizedWeight(
            jax.lax.dynamic_index_in_dim(self.q, i, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(self.s, i, 0, keepdims=False),
            self.mode,
        )


def quantize_weight(w: jax.Array, mode: str = "w8a8") -> QuantizedWeight:
    """Per-output-channel symmetric quantization over the contraction axis.

    ``w8a8`` / ``w8a16``: int8 storage. ``fp8``: float8_e4m3fn storage
    (north-star lists "INT8/FP8 weights"; v5e has no native fp8 MXU path so
    fp8 dequantizes to bf16 in the dot fusion like w8a16 — same HBM
    savings, different rounding profile; on fp8-native TPUs XLA lowers the
    e4m3 dot directly)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    if mode == "fp8":
        scale = jnp.maximum(absmax / 448.0, 1e-8)  # e4m3 max normal
        q = (w.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    else:
        scale = jnp.maximum(absmax / 127.0, 1e-8)  # [.., 1, N]
        q = jnp.clip(
            jnp.round(w.astype(jnp.float32) / scale), -127, 127
        ).astype(jnp.int8)
    return QuantizedWeight(q, scale[..., 0, :].astype(jnp.float32), mode)


def int8_linear_w8a16(x: jax.Array, wq: QuantizedWeight) -> jax.Array:
    """bf16 activations x int8 weights (dequant in the dot fusion)."""
    w = wq.q.astype(x.dtype) * wq.s.astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def int8_linear_w8a8(x: jax.Array, wq: QuantizedWeight) -> jax.Array:
    """Dynamic per-row int8 activations x int8 weights on the MXU int8 path."""
    xf = x.astype(jnp.float32)
    row_max = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    sx = jnp.maximum(row_max / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq.q,
        (((xq.ndim - 1,), (wq.q.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * wq.s
    return y.astype(x.dtype)


def quantized_linear(x: jax.Array, wq: QuantizedWeight) -> jax.Array:
    if wq.mode in ("w8a16", "fp8"):
        # weight-only: dequantize (int8 or e4m3) into the dot fusion
        return int8_linear_w8a16(x, wq)
    return int8_linear_w8a8(x, wq)


QUANTIZABLE_LAYER_KEYS = (
    "q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w",
    # fused variants (models/transformer.fuse_layer_stack)
    "qkv_w", "gateup_w",
)


def quantize_layer_stack(layers: dict, mode: str = "w8a8") -> dict:
    out = dict(layers)
    for k in QUANTIZABLE_LAYER_KEYS:
        if k in out:
            out[k] = quantize_weight(out[k], mode)
    return out


def quantize_talker_params(params: dict, mode: str = "w8a8") -> dict:
    out = dict(params)
    out["layers"] = quantize_layer_stack(params["layers"], mode)
    out["codec_head_w"] = quantize_weight(params["codec_head_w"], mode)
    return out


def quantize_predictor_params(params: dict, mode: str = "w8a8") -> dict:
    out = dict(params)
    out["layers"] = quantize_layer_stack(params["layers"], mode)
    out["lm_heads"] = quantize_weight(params["lm_heads"], mode)  # [15, Dp, V]
    return out
