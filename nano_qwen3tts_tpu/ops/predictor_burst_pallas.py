"""Pallas TPU kernel: the FULL predictor frame burst with VMEM-resident
weights.

The code predictor expands one talker frame into codebooks 1..15 by running
a 5-layer transformer 16 times sequentially (2-token prefill + 15 decode
steps; models/predictor.py, reference qwen3_tts_predictor.py:17-124 +
predictor_worker.py:125-144). In XLA form each of those 16 passes re-streams
all ~79 MB (int8) of predictor weights from HBM — ~1.25 GB of traffic per
frame, the single largest cost in the serving step.

This kernel runs the whole burst as ONE ``pallas_call`` with
``grid=(17,)`` over token positions:

* all 5 layers' int8 weights are whole-array VMEM blocks with constant
  index maps — Mosaic's block-revisiting keeps them resident across grid
  steps, so HBM reads them ONCE per frame (v5e has 128 MB VMEM);
* the per-step codebook embedding table and LM head are streamed blocks
  (index map follows the grid step) — Mosaic double-buffers them behind
  compute;
* the 17-token KV window lives in VMEM scratch (scratch persists across
  sequential grid steps);
* the 2-token "prefill" is expressed as 2 ordinary decode steps — causal
  attention makes token-by-token processing exactly equivalent;
* sampling (temperature -> top-k 50 -> categorical) happens in-kernel:
  the top-k threshold by 30-step value bisection, the categorical draw by
  Gumbel-max over the masked logits. The Gumbel noise is precomputed
  OUTSIDE the kernel with exactly the key-split sequence the XLA path's
  ``jax.random.categorical`` consumes, so the kernel samples the SAME
  tokens as models/predictor.predictor_frame for the same key — at every
  temperature, not just argmax.

Matmuls use the same w8a8 dynamic-activation recipe as ops/quant.py
(per-row int8 activations x per-channel int8 weights on the int8 MXU path,
f32 rescale), so numerics match the XLA path to rounding.

Requires: fused qkv/gateup weights (transformer.fuse_layer_stack), w8a8
QuantizedWeight leaves, no small_to_mtp projection (predictor hidden ==
talker hidden, true for the 1.7B family). The engine falls back to the XLA
scan path otherwise (engine/fused_step.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nano_qwen3tts_tpu.models.predictor import KV_WINDOW, NUM_STEPS
from nano_qwen3tts_tpu.models.transformer import AttnSpec, make_inv_freq

NEG_INF = float(jnp.finfo(jnp.float32).min)
# KV window (17 real positions) padded to a sublane-tile multiple. 24, not
# 32: the window attention is the kernel's dominant batch-scaled cost (VPU
# broadcast-reduce over [W, B*Hq, d]), so every pad row costs real time.
W_PAD = 24
TOP_K = 50
BISECT_ITERS = 30


def _int8_mm(x, wq_ref, ws_ref, out_dtype=jnp.bfloat16):
    """w8a8 matmul matching ops/quant.int8_linear_w8a8: dynamic per-row int8
    activations x int8 weights -> int32 MXU accumulate -> f32 rescale."""
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * ws_ref[:].reshape(1, -1)
    return y.astype(out_dtype)


def _rms_norm(x, w, eps):
    """transformer.rms_norm: f32 stats, cast back before the weight mul."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return xf.astype(orig) * w


def _burst_kernel(
    # inputs
    x01_ref, qkv_q_ref, qkv_s_ref, o_q_ref, o_s_ref, gu_q_ref, gu_s_ref,
    dn_q_ref, dn_s_ref, ln1_ref, ln2_ref, qn_ref, kn_ref, fn_ref,
    cos_ref, sin_ref, rot_ref, table_ref, head_q_ref, head_s_ref, gum_ref,
    temps_ref,
    # outputs
    toks_ref, emb_ref,
    # scratch
    k_scr, v_scr, emb_acc,
    *, spec: AttnSpec, num_layers: int, B: int, D: int, V: int,
):
    s = pl.program_id(0)
    Hq, Hkv, d = spec.num_heads, spec.num_kv_heads, spec.head_dim
    nq, nkv = Hq * d, Hkv * d

    @pl.when(s == 0)
    def _init():
        emb_acc[:] = jnp.zeros((B, D), jnp.float32)
        for l in range(num_layers):
            k_scr[l] = jnp.zeros((W_PAD, B, nkv), k_scr.dtype)
            v_scr[l] = jnp.zeros((W_PAD, B, nkv), v_scr.dtype)

    # ---- input embedding for this token position ---------------------------
    # s=0: talker last hidden; s=1: talker codec_embedding(cb0);
    # s>=2: per-codebook table[s-2] row of the token sampled at step s-1.
    prev = toks_ref[pl.ds(jnp.maximum(s - 2, 0), 1)].reshape(1, B)  # int32
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (V, B), 0) == prev
    ).astype(jnp.bfloat16)  # [V, B]
    x_tok = jax.lax.dot_general(
        onehot, table_ref[0],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # [B, D]

    @pl.when(s >= 2)
    def _accum():
        emb_acc[:] = emb_acc[:] + x_tok.astype(jnp.float32)

    @pl.when(s == NUM_STEPS + 1)  # s == 16: final table-14 embed only
    def _emit_sum():
        emb_ref[:] = emb_acc[:]

    @pl.when(s <= NUM_STEPS)
    def _transformer():
        x = jnp.where(
            s == 0, x01_ref[0], jnp.where(s == 1, x01_ref[1], x_tok)
        ).astype(jnp.bfloat16)

        cos = cos_ref[0].astype(jnp.bfloat16)  # [1, d] (per-step block)
        sin = sin_ref[0].astype(jnp.bfloat16)
        rot = rot_ref[:]  # [d, d] rotate-half permutation (+-1 entries)

        def rope(t):  # t [B, H, d]
            tr = jax.lax.dot_general(
                t.reshape(-1, d), rot,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(t.dtype).reshape(t.shape)
            return t * cos[None] + tr * sin[None]

        h = x
        for l in range(num_layers):
            xn = _rms_norm(h, ln1_ref[l, 0], spec.rms_norm_eps)
            qkv = _int8_mm(xn, qkv_q_ref.at[l], qkv_s_ref.at[l])  # [B, nq+2nkv]
            q = qkv[:, :nq].reshape(B, Hq, d)
            k = qkv[:, nq : nq + nkv].reshape(B, Hkv, d)
            v = qkv[:, nq + nkv :]  # [B, nkv] flat
            if not spec.qkv_bias:  # per-head QK-RMSNorm
                q = _rms_norm(q, qn_ref[l, 0], spec.rms_norm_eps)
                k = _rms_norm(k, kn_ref[l, 0], spec.rms_norm_eps)
            q = rope(q)
            k = rope(k)

            # KV scratch layout [L, W, B, nkv]: the window axis stays out
            # of the tiled last-two dims so the dynamic per-step store is
            # legal (Mosaic requires aligned indices inside tiles)
            k_scr[l, pl.ds(s, 1)] = k.reshape(1, B, nkv)
            v_scr[l, pl.ds(s, 1)] = v.reshape(1, B, nkv)

            # attention over the window (positions <= s), GQA expansion by
            # consecutive repeat (ops/attention._repeat_kv). (B, Hq) folds
            # into one minor axis so scores are a well-tiled 2-D [W, B*Hq]
            # (a [W, B, Hq] f32 with a 16-wide minor trips Mosaic relayouts).
            n_rep = Hq // Hkv
            kw = k_scr[l].reshape(W_PAD, B, Hkv, 1, d)
            vw = v_scr[l].reshape(W_PAD, B, Hkv, 1, d)
            kw = jnp.broadcast_to(kw, (W_PAD, B, Hkv, n_rep, d)).reshape(
                W_PAD, B * Hq, d
            )
            vw = jnp.broadcast_to(vw, (W_PAD, B, Hkv, n_rep, d)).reshape(
                W_PAD, B * Hq, d
            )
            qf = q.astype(jnp.float32).reshape(B * Hq, d)
            scores = jnp.sum(
                qf[None] * kw.astype(jnp.float32), axis=-1
            ) * spec.scale  # [W, B*Hq]
            wmask = (
                jax.lax.broadcasted_iota(jnp.int32, (W_PAD, B * Hq), 0) <= s
            )
            scores = jnp.where(wmask, scores, NEG_INF)
            m = jnp.max(scores, axis=0, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            attn = jnp.sum(
                p[..., None] * vw.astype(jnp.float32), axis=0
            )  # [B*Hq, d] f32
            attn = attn.astype(jnp.bfloat16).reshape(B, nq)

            h = h + _int8_mm(attn, o_q_ref.at[l], o_s_ref.at[l])
            xn2 = _rms_norm(h, ln2_ref[l, 0], spec.rms_norm_eps)
            gu = _int8_mm(xn2, gu_q_ref.at[l], gu_s_ref.at[l])  # [B, 2I]
            I = gu.shape[-1] // 2
            # silu with bf16 rounding, same as the XLA path (swiglu_mlp works
            # in the params dtype); spelled out because Mosaic mis-verifies
            # jax.nn.silu on bf16 (f32 broadcast into a bf16 vector)
            g_ = gu[:, :I]
            sig = (
                1.0 / (1.0 + jnp.exp(-g_.astype(jnp.float32)))
            ).astype(jnp.bfloat16)
            act = (g_ * sig) * gu[:, I:]
            h = h + _int8_mm(act, dn_q_ref.at[l], dn_s_ref.at[l])

        @pl.when(s >= 1)
        def _sample():
            hidden = _rms_norm(h, fn_ref[:], spec.rms_norm_eps)
            # bf16 round-trip matches the XLA path (linear() returns x.dtype,
            # sample_top_k then casts to f32) so argmax tokens agree exactly
            logits = _int8_mm(
                hidden, head_q_ref.at[0], head_s_ref.at[0], jnp.bfloat16
            ).astype(jnp.float32)
            logits = logits / temps_ref[:, :1]

            # top-k(50) threshold by value bisection: converges to the k-th
            # largest per row (ties kept, like sample_top_k's `< kth` mask)
            lo = jnp.min(logits, axis=-1, keepdims=True) - 1.0
            hi = jnp.max(logits, axis=-1, keepdims=True)
            for _ in range(BISECT_ITERS):
                mid = 0.5 * (lo + hi)
                cnt = jnp.sum(
                    (logits >= mid).astype(jnp.float32), axis=-1, keepdims=True
                )
                keep = cnt >= TOP_K
                lo = jnp.where(keep, mid, lo)
                hi = jnp.where(keep, hi, mid)
            masked = jnp.where(logits >= lo, logits, NEG_INF)

            # categorical via Gumbel-max; gum_ref holds jax.random.gumbel
            # noise from the XLA path's exact key-split sequence
            tok = jnp.argmax(masked + gum_ref[0], axis=-1).astype(jnp.int32)
            toks_ref[pl.ds(s - 1, 1)] = tok.reshape(1, 1, B)

    del _init, _accum, _emit_sum, _transformer


def _burst_kernel_loop(
    # inputs
    x01_ref, qkv_q_ref, qkv_s_ref, o_q_ref, o_s_ref, gu_q_ref, gu_s_ref,
    dn_q_ref, dn_s_ref, ln1_ref, ln2_ref, qn_ref, kn_ref, fn_ref,
    cos_ref, sin_ref, rot_ref, table_ref, head_q_ref, head_s_ref, gum_ref,
    temps_ref,
    # outputs
    toks_ref, emb_ref,
    # scratch
    k_scr, v_scr, emb_acc,
    *, spec: AttnSpec, num_layers: int, B: int, D: int, V: int,
):
    """Loop-formulation twin of _burst_kernel for the flat 64-lane tier.

    Same math, same sampling, same outputs — but the 5-layer transformer
    body runs as ONE ``lax.fori_loop`` iteration with dynamically indexed
    weight refs, and the top-k bisection as a 30-iteration ``fori_loop``,
    instead of Python-unrolled copies. The unrolled body is what blows the
    chipless Mosaic compile helper's memory at B=64 (tools/
    b64_kernel_probe.py: ~20 min then SIGKILL): compile memory scales with
    the number of traced vector ops, and the unrolled kernel carries
    5 layers x the full attention/matmul graph + 30 bisection steps at
    [B, V]. Looping collapses that to one layer body + one bisection step.
    The payoff of a flat 64-lane call over two sequential 32-lane panes:
    every matmul pass is MXU-latency-bound at M <= 64, so one M=64 pass
    costs the same wall time as one M=32 pass — 2x the lanes for free."""
    s = pl.program_id(0)
    Hq, Hkv, d = spec.num_heads, spec.num_kv_heads, spec.head_dim
    nq, nkv = Hq * d, Hkv * d

    @pl.when(s == 0)
    def _init():
        emb_acc[:] = jnp.zeros((B, D), jnp.float32)
        k_scr[:] = jnp.zeros(k_scr.shape, k_scr.dtype)
        v_scr[:] = jnp.zeros(v_scr.shape, v_scr.dtype)

    prev = toks_ref[pl.ds(jnp.maximum(s - 2, 0), 1)].reshape(1, B)  # int32
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (V, B), 0) == prev
    ).astype(jnp.bfloat16)  # [V, B]
    x_tok = jax.lax.dot_general(
        onehot, table_ref[0],
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)  # [B, D]

    @pl.when(s >= 2)
    def _accum():
        emb_acc[:] = emb_acc[:] + x_tok.astype(jnp.float32)

    @pl.when(s == NUM_STEPS + 1)  # s == 16: final table-14 embed only
    def _emit_sum():
        emb_ref[:] = emb_acc[:]

    @pl.when(s <= NUM_STEPS)
    def _transformer():
        x = jnp.where(
            s == 0, x01_ref[0], jnp.where(s == 1, x01_ref[1], x_tok)
        ).astype(jnp.bfloat16)

        cos = cos_ref[0].astype(jnp.bfloat16)  # [1, d] (per-step block)
        sin = sin_ref[0].astype(jnp.bfloat16)
        rot = rot_ref[:]  # [d, d] rotate-half permutation (+-1 entries)

        def rope(t):  # t [B, H, d]
            tr = jax.lax.dot_general(
                t.reshape(-1, d), rot,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(t.dtype).reshape(t.shape)
            return t * cos[None] + tr * sin[None]

        def layer_body(l, h):
            xn = _rms_norm(h, ln1_ref[l, 0], spec.rms_norm_eps)
            qkv = _int8_mm(xn, qkv_q_ref.at[l], qkv_s_ref.at[l])
            q = qkv[:, :nq].reshape(B, Hq, d)
            k = qkv[:, nq : nq + nkv].reshape(B, Hkv, d)
            v = qkv[:, nq + nkv :]  # [B, nkv] flat
            if not spec.qkv_bias:  # per-head QK-RMSNorm
                q = _rms_norm(q, qn_ref[l, 0], spec.rms_norm_eps)
                k = _rms_norm(k, kn_ref[l, 0], spec.rms_norm_eps)
            q = rope(q)
            k = rope(k)

            k_scr[l, pl.ds(s, 1)] = k.reshape(1, B, nkv)
            v_scr[l, pl.ds(s, 1)] = v.reshape(1, B, nkv)

            n_rep = Hq // Hkv
            kw = k_scr[l].reshape(W_PAD, B, Hkv, 1, d)
            vw = v_scr[l].reshape(W_PAD, B, Hkv, 1, d)
            kw = jnp.broadcast_to(kw, (W_PAD, B, Hkv, n_rep, d)).reshape(
                W_PAD, B * Hq, d
            )
            vw = jnp.broadcast_to(vw, (W_PAD, B, Hkv, n_rep, d)).reshape(
                W_PAD, B * Hq, d
            )
            qf = q.astype(jnp.float32).reshape(B * Hq, d)
            scores = jnp.sum(
                qf[None] * kw.astype(jnp.float32), axis=-1
            ) * spec.scale  # [W, B*Hq]
            wmask = (
                jax.lax.broadcasted_iota(jnp.int32, (W_PAD, B * Hq), 0) <= s
            )
            scores = jnp.where(wmask, scores, NEG_INF)
            m = jnp.max(scores, axis=0, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=0, keepdims=True)
            attn = jnp.sum(
                p[..., None] * vw.astype(jnp.float32), axis=0
            )  # [B*Hq, d] f32
            attn = attn.astype(jnp.bfloat16).reshape(B, nq)

            h = h + _int8_mm(attn, o_q_ref.at[l], o_s_ref.at[l])
            xn2 = _rms_norm(h, ln2_ref[l, 0], spec.rms_norm_eps)
            gu = _int8_mm(xn2, gu_q_ref.at[l], gu_s_ref.at[l])  # [B, 2I]
            I = gu.shape[-1] // 2
            g_ = gu[:, :I]
            sig = (
                1.0 / (1.0 + jnp.exp(-g_.astype(jnp.float32)))
            ).astype(jnp.bfloat16)
            act = (g_ * sig) * gu[:, I:]
            h = h + _int8_mm(act, dn_q_ref.at[l], dn_s_ref.at[l])
            return h

        h = jax.lax.fori_loop(0, num_layers, layer_body, x)

        @pl.when(s >= 1)
        def _sample():
            hidden = _rms_norm(h, fn_ref[:], spec.rms_norm_eps)
            logits = _int8_mm(
                hidden, head_q_ref.at[0], head_s_ref.at[0], jnp.bfloat16
            ).astype(jnp.float32)
            logits = logits / temps_ref[:, :1]

            lo = jnp.min(logits, axis=-1, keepdims=True) - 1.0
            hi = jnp.max(logits, axis=-1, keepdims=True)

            def bisect_body(_, c):
                lo_, hi_ = c
                mid = 0.5 * (lo_ + hi_)
                cnt = jnp.sum(
                    (logits >= mid).astype(jnp.float32), axis=-1, keepdims=True
                )
                keep = cnt >= TOP_K
                return jnp.where(keep, mid, lo_), jnp.where(keep, hi_, mid)

            lo, hi = jax.lax.fori_loop(0, BISECT_ITERS, bisect_body, (lo, hi))
            masked = jnp.where(logits >= lo, logits, NEG_INF)

            tok = jnp.argmax(masked + gum_ref[0], axis=-1).astype(jnp.int32)
            toks_ref[pl.ds(s - 1, 1)] = tok.reshape(1, 1, B)

        del _sample

    del _init, _accum, _emit_sum, _transformer


def _rotate_half_matrix(d: int) -> np.ndarray:
    """R such that x @ R == concat(-x[d/2:], x[:d/2]) (rotate_half)."""
    R = np.zeros((d, d), np.float32)
    h = d // 2
    for i in range(h):
        R[i + h, i] = -1.0  # out[:, i] = -x[:, i+h]
        R[i, i + h] = 1.0  # out[:, i+h] = x[:, i]
    return R


@functools.lru_cache(maxsize=None)
def _rope_tables(spec: AttnSpec, n_pos: int):
    # pure-numpy twin of transformer.make_inv_freq (host-computable in-jit)
    d = spec.head_dim
    inv = 1.0 / (
        np.float32(spec.rope_theta)
        ** (np.arange(0, d, 2, dtype=np.float32) / np.float32(d))
    )
    pos = np.arange(n_pos, dtype=np.float32)
    freqs = pos[:, None] * inv[None, :]  # [n_pos, d/2]
    cos = np.concatenate([np.cos(freqs), np.cos(freqs)], -1) * spec.attention_scaling
    sin = np.concatenate([np.sin(freqs), np.sin(freqs)], -1) * spec.attention_scaling
    # cache numpy only — caching jnp arrays created under a jit trace would
    # leak tracers into later traces
    return (
        cos.astype(np.float32),
        sin.astype(np.float32),
        _rotate_half_matrix(spec.head_dim),
    )


def supports_burst(params: dict, spec: AttnSpec) -> bool:
    """The kernel covers the fused + w8a8-quantized + no-projection layout."""
    from nano_qwen3tts_tpu.ops.quant import QuantizedWeight

    lay = params["layers"]
    return (
        "proj_w" not in params
        and not spec.qkv_bias
        and isinstance(lay.get("qkv_w"), QuantizedWeight)
        and lay["qkv_w"].mode == "w8a8"
        and isinstance(params.get("lm_heads"), QuantizedWeight)
        and spec.head_dim in (128, 256)
    )


def _mid1(a, dtype=jnp.float32):
    """[L, N] -> [L, 1, N]: keeps the per-layer index off the tiled dims."""
    return a.astype(dtype).reshape(a.shape[0], 1, a.shape[1])


def predictor_frame_burst(
    params: dict,
    spec: AttnSpec,
    talker_hidden: jax.Array,  # [B, D]
    cb0_embed: jax.Array,  # [B, D]
    temperatures: jax.Array,  # [B] f32
    key: jax.Array,  # PRNG key — same key-split sequence as predictor_frame
    interpret: bool = False,
    pane_size: int = 32,
    flat: bool | None = None,
):
    """Drop-in alternative to models/predictor.predictor_frame (same
    signature, same outputs: tokens [B, 15] int32, pred_emb_sum [B, D]).
    For a given key it samples the same tokens as the XLA path.

    ``flat`` (default: env PREDICTOR_BURST_FLAT=1) runs B > pane_size as
    ONE loop-formulation kernel call (_burst_kernel_loop) instead of
    sequential panes: every matmul pass is MXU-latency-bound at M <= 64,
    so the flat M=64 call costs one pane's wall time — 2x the pane-split
    throughput — while the fori_loop body keeps the Mosaic compile memory
    at the one-layer size that the unrolled flat kernel blew.

    B > pane_size (the 64+-lane tier) runs as ceil(B/pane_size) SEQUENTIAL
    pane calls of the proven <=32-lane kernel: the flat 64-lane kernel
    body reproducibly OOM-kills the chipless Mosaic compile helper
    (tools/b64_kernel_probe.py, ~20 min then SIGKILL), while pane calls
    reuse the compile-budget-proven shape. Cost of the split is one extra
    HBM->VMEM stream of the ~63 MB of predictor weights per extra pane
    (~0.1 ms on v5e) — the per-token matmul passes are M<=32 MXU-latency
    bound either way, so a flat 64-lane kernel would run nearly the same
    wall time. The Gumbel slabs are drawn ONCE at full B with the XLA
    path's exact key-split sequence and sliced per pane, so the split
    samples IDENTICAL tokens to both the XLA path and a hypothetical flat
    kernel at the same key."""
    lay = params["layers"]
    B, D = talker_hidden.shape
    V = params["codec_embeddings"].shape[1]

    # Gumbel noise, one [B, V] slab per sampled codebook, drawn with the
    # exact split sequence predictor_frame feeds to jax.random.categorical
    # (categorical(key, logits) == argmax(logits + gumbel(key, shape))).
    subs = []
    for _ in range(NUM_STEPS):
        key, sub = jax.random.split(key)
        subs.append(sub)
    gumbels = jax.vmap(
        lambda k: jax.random.gumbel(k, (B, V), jnp.float32)
    )(jnp.stack(subs))  # [15, B, V]

    if flat is None:
        import os

        flat = os.environ.get("PREDICTOR_BURST_FLAT") == "1"
    if B > pane_size and not flat:
        n_panes = -(-B // pane_size)
        assert B % n_panes == 0, f"batch {B} not divisible into panes"
        bp = B // n_panes
        toks, sums = [], []
        for p in range(n_panes):
            sl = slice(p * bp, (p + 1) * bp)
            t, s = _run_burst(
                params, spec, talker_hidden[sl], cb0_embed[sl],
                temperatures[sl], gumbels[:, sl], interpret,
            )
            toks.append(t)
            sums.append(s)
        return (
            jnp.concatenate(toks, axis=0),
            jnp.concatenate(sums, axis=0).astype(talker_hidden.dtype),
        )
    t, s = _run_burst(
        params, spec, talker_hidden, cb0_embed, temperatures, gumbels,
        interpret, loop_body=bool(flat) and B > pane_size,
    )
    return t, s.astype(talker_hidden.dtype)


def _run_burst(params, spec, talker_hidden, cb0_embed, temperatures,
               gumbels, interpret, loop_body: bool = False):
    """One kernel invocation (<=32 lanes unrolled, or any B with
    loop_body=True). gumbels [15, B, V] — precomputed by the caller
    (sliced per pane in split mode)."""
    lay = params["layers"]
    B, D = talker_hidden.shape
    tables = params["codec_embeddings"].astype(jnp.bfloat16)  # [15, V, D]
    V = tables.shape[1]
    num_layers = lay["input_layernorm"].shape[0]
    heads = params["lm_heads"]  # QuantizedWeight [15, D, V]
    cos_np, sin_np, rot_np = _rope_tables(spec, NUM_STEPS + 2)
    cos = jnp.asarray(cos_np.reshape(NUM_STEPS + 2, 1, spec.head_dim))
    sin = jnp.asarray(sin_np.reshape(NUM_STEPS + 2, 1, spec.head_dim))
    rot = jnp.asarray(rot_np, jnp.bfloat16)

    n_steps = NUM_STEPS + 2  # 16 token positions + final-embed step
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [
        vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem, vmem,  # x01 + weights
        vmem, vmem, vmem, vmem, vmem,  # norms
        # cos/sin row for this step, streamed (dynamic sublane slices of a
        # tiled array are illegal in Mosaic — let the pipeline do it)
        pl.BlockSpec((1, 1, spec.head_dim), lambda s: (s, 0, 0)),
        pl.BlockSpec((1, 1, spec.head_dim), lambda s: (s, 0, 0)),
        vmem,  # rot
        # streamed per step: embedding table s-2, LM head / gumbel s-1
        pl.BlockSpec(
            (1, V, D), lambda s: (jnp.clip(s - 2, 0, NUM_STEPS - 1), 0, 0)
        ),
        pl.BlockSpec(
            (1, D, V), lambda s: (jnp.clip(s - 1, 0, NUM_STEPS - 1), 0, 0)
        ),
        pl.BlockSpec(
            (1, 1, V), lambda s: (jnp.clip(s - 1, 0, NUM_STEPS - 1), 0, 0)
        ),
        pl.BlockSpec(
            (1, B, V), lambda s: (jnp.clip(s - 1, 0, NUM_STEPS - 1), 0, 0)
        ),
        vmem,  # temps
    ]

    kernel = functools.partial(
        _burst_kernel_loop if loop_body else _burst_kernel,
        spec=spec, num_layers=num_layers, B=B, D=D, V=V,
    )
    toks, emb_sum = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=[vmem, vmem],
        out_shape=[
            jax.ShapeDtypeStruct((NUM_STEPS, 1, B), jnp.int32),
            jax.ShapeDtypeStruct((B, D), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (num_layers, W_PAD, B, spec.num_kv_heads * spec.head_dim),
                jnp.bfloat16,
            ),
            pltpu.VMEM(
                (num_layers, W_PAD, B, spec.num_kv_heads * spec.head_dim),
                jnp.bfloat16,
            ),
            pltpu.VMEM((B, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        jnp.stack([talker_hidden, cb0_embed]).astype(jnp.bfloat16),
        lay["qkv_w"].q, _mid1(lay["qkv_w"].s),
        lay["o_w"].q, _mid1(lay["o_w"].s),
        lay["gateup_w"].q, _mid1(lay["gateup_w"].s),
        lay["down_w"].q, _mid1(lay["down_w"].s),
        _mid1(lay["input_layernorm"], jnp.bfloat16),
        _mid1(lay["post_attention_layernorm"], jnp.bfloat16),
        _mid1(lay["q_norm"], jnp.bfloat16),
        _mid1(lay["k_norm"], jnp.bfloat16),
        params["norm"].astype(jnp.bfloat16).reshape(1, -1),
        cos, sin, rot,
        tables,
        heads.q, heads.s.astype(jnp.float32).reshape(NUM_STEPS, 1, V),
        gumbels,
        temperatures.astype(jnp.float32).reshape(B, 1),
    )
    return toks.reshape(NUM_STEPS, B).T, emb_sum
