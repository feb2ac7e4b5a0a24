"""Pallas TPU kernel: the FULL talker decode stack (all layers) in one call.

The talker decode step — 20 pre-norm decoder layers on ONE token per lane
with paged attention over the KV cache (reference models/qwen3_tts_talker.py
+ flash_attn_with_kvcache, layers/attention.py:93-95) — is, after the
predictor burst kernel landed, the largest cost in the serving frame
(~3.5 ms of the 5.5 ms batch-8 frame on v5e). In XLA form it is
kernel-launch-overhead-bound: 20 unrolled layers x ~12 small fused kernels.

This kernel runs the whole stack as ONE ``pallas_call`` with ``grid=(L,)``
over layers:

* per-layer int8 weights are streamed blocks (index map follows the grid
  step) — Mosaic double-buffers the ~9 MB/layer behind compute, so the
  weight HBM traffic (the physical floor of decode) hides the math;
* the int8 KV **value** planes are passed ONCE as ``memory_space=ANY``
  operands (they stay in HBM) and each lane's cache block is fetched with
  in-kernel double-buffered ``make_async_copy`` DMAs, indexed by
  scalar-prefetched block-table entries. Crucially the value planes are
  also ``input_output_aliases``-aliased to outputs and the NEW K/V rows are
  quantized and DMA-written back **inside the kernel** — the cache is never
  an XLA-visible read or dynamic-update-slice, so the donated scan carry
  stays fully in place (the previous streamed-operand design forced XLA to
  materialize ~336 MB of cache copies per frame inside the multi-frame
  decode scan);
* in-kernel row writes go at 8-row-aligned windows (the HBM int8 layout is
  sublane-tiled ``(8,128)``): the window's history rows are restored from
  the already-fetched block bytes (bit-exact) and rows above the write
  offset are never read back (the kv_len mask excludes them) — this is why
  ``block_size`` must be a multiple of 8;
* per-slot KV **scales** are small (4 B/slot vs 128 B/slot of values), so
  they stay XLA-side: the per-lane windows are gathered into one
  ``[B, L, 1, bs]`` VMEM input (the unit dim keeps both lane and layer
  indices on untiled leading axes — NEVER stream ``[.., bs, 1]`` blocks:
  a minor-dim-1 layout is physically padded to the 128-lane tile and XLA
  materializes a 128x-padded copy of the whole scale plane every frame,
  which was the dominant cost of the first integration) and the new rows'
  scales leave via a packed ``[L, B, 128]`` output that the caller scatters
  with a normal in-place dynamic-update-slice. Dequantization folds into
  attention AFTER the matmuls: int8 cache values are exact in bfloat16, so
  ``scores = (q·k_int) * scale * sk[1,bs]`` and ``probs * sv[1,bs]`` give
  the same math with per-column scale rows instead of per-row columns;
* attention is attend-with-extension, exactly like the XLA fallback
  (ops/paged_attention_pallas.paged_decode_attention_extend_int8_xla):
  the current token's K/V stay in registers, int8 window dequant is folded
  into the scores/probs as per-slot scales;
* the residual stream lives in VMEM scratch across grid steps.

Head padding: the talker's head_dim is 64, but Mosaic only supports
reshapes whose minor dim is a multiple of the 128-lane width — so the
kernel uses a precomputed weight layout (``make_burst_params``) where every
head occupies 128 lanes (64 real + 64 zero columns). Pad lanes are exact
zeros through QK-norm/RoPE/attention, and the o-projection has zero ROWS at
pad positions, so the math is unchanged. Per-layer pallas calls are NOT an
option (programs with >100 pallas instances crash the TPU compiler) — one
call per frame is the design point.

Requires: fused qkv/gateup w8a8 QuantizedWeight layers (no qkv bias), int8
KV cache, one block per lane, and ``make_burst_params`` applied at engine
build. models/talker.talker_decode falls back to the XLA stack otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nano_qwen3tts_tpu.models.transformer import AttnSpec

NEG_INF = float(jnp.finfo(jnp.float32).min)
DP = 128  # padded per-head lane width
WROWS = 8  # write-window rows (HBM int8 sublane tile)


def _int8_mm(x, wq_ref, ws_ref, out_dtype=jnp.bfloat16):
    """w8a8 matmul matching ops/quant.int8_linear_w8a8 (and the predictor
    burst kernel): per-row dynamic int8 activations x int8 weights."""
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
    orig = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    return xf.astype(orig) * w


def _rms_norm_padded(x, w, eps, d_real):
    """Per-head RMS norm over a [., H, DP] padded layout: variance over the
    d_real real lanes only (pads are exact zeros, so sum is unaffected)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / d_real
    xf = xf * jax.lax.rsqrt(var + eps)
    return xf.astype(orig) * w


def _stack_kernel(
    # scalar prefetch
    tables_ref,  # [B_total] int32 (one block id per lane)
    woff_ref,    # [B_total] int32 write offset in block == existing entries
    # inputs
    x_ref,            # [B, D] bf16 (per-pane block when n_panes > 1)
    pos_ref,          # [B, 1] int32 rope positions
    woffv_ref,        # [B, 1] int32 write offsets as a vector (batched masks)
    qkv_q_ref, qkv_s_ref, o_q_ref, o_s_ref,
    gu_q_ref, gu_s_ref, dn_q_ref, dn_s_ref,
    ln1_ref, ln2_ref, qn_ref, kn_ref, fn_ref,
    inv_ref,          # [1, DP] f32 inv_freq (padded-head pattern, pads 0)
    rot_ref,          # [DP, DP] bf16 rotate-half matrix (pads 0)
    epad_ref,         # [nkv, Hkv*DP] bf16 0/1 pad-expansion for cache K/V
    eunp_ref,         # [Hkv*DP, nkv] bf16 0/1 un-pad for new K/V rows
    *rest,
    spec: AttnSpec, num_layers: int, B: int, D: int, block_size: int,
    batched_attn: bool = False, n_panes: int = 1,
):
    # rest = ksw, vsw ([L, B, 1, bs] f32 gathered scale windows; per-(l,p)
    # blocks in pane mode), kq_hbm, vq_hbm (ANY), then outputs
    # (hid, scl, kq_out, vq_out), then scratch (h, kbuf, vbuf, rowk, rowv,
    # rsem, wsem [+ kb16, vb16 in batched-attention mode]).
    #
    # n_panes > 1 (the 64+-lane tier): grid (L, n_panes); each step runs
    # the batched-attention body on ONE 32-lane pane, so per-step VMEM,
    # unrolled-DMA count and vector-code size stay at the 32-lane point
    # that fits the Mosaic compile budget (tools/batch64_probe.py: the flat
    # 64-lane formulation OOMs the compile helper) — while the per-layer
    # weight blocks are indexed by l only, so panes of the same layer
    # revisit the SAME block and the weight HBM stream stays once/layer
    # (the whole reason batch 64 beats 2x batch 32).
    ksw_ref, vsw_ref, kq_hbm, vq_hbm = rest[:4]
    hid_ref, scl_ref, kq_out, vq_out = rest[4:8]
    if batched_attn:
        h_scr, kbuf, vbuf, rowk, rowv, rsem, wsem, kb16, vb16 = rest[8:]
    else:
        h_scr, kbuf, vbuf, rowk, rowv, rsem, wsem = rest[8:]

    l = pl.program_id(0)
    pane = pl.program_id(1) if n_panes > 1 else 0
    step = l * n_panes + pane
    Hq, Hkv, d = spec.num_heads, spec.num_kv_heads, spec.head_dim
    nqp, nkvp = Hq * DP, Hkv * DP
    nkv = Hkv * d
    n_rep = Hq // Hkv

    def _reads(ll, pp, slot):
        for b in range(B):
            start = tables_ref[pp * B + b] * block_size
            yield pltpu.make_async_copy(
                kq_hbm.at[ll, pl.ds(start, block_size), :],
                kbuf.at[slot, b], rsem.at[slot, b, 0],
            )
            yield pltpu.make_async_copy(
                vq_hbm.at[ll, pl.ds(start, block_size), :],
                vbuf.at[slot, b], rsem.at[slot, b, 1],
            )

    @pl.when(step == 0)
    def _first_reads():
        for dma in _reads(0, 0, 0):
            dma.start()

    @pl.when(l == 0)
    def _init():
        h_scr[pane] = x_ref[:]

    @pl.when(step + 1 < num_layers * n_panes)
    def _prefetch():
        if n_panes > 1:
            nl = l + (pane + 1) // n_panes
            np_ = (pane + 1) % n_panes
        else:
            nl, np_ = l + 1, 0
        for dma in _reads(nl, np_, (step + 1) % 2):
            dma.start()

    h = h_scr[pane]
    xn = _rms_norm(h, ln1_ref[0], spec.rms_norm_eps)
    qkv = _int8_mm(xn, qkv_q_ref.at[0], qkv_s_ref.at[0])  # [B, nqp+2nkvp]
    q = qkv[:, :nqp].reshape(B, Hq, DP)
    k = qkv[:, nqp : nqp + nkvp].reshape(B, Hkv, DP)
    vp = qkv[:, nqp + nkvp :]  # [B, nkvp] padded V
    # per-head QK-RMSNorm over the 64 real lanes (talker has no qkv bias)
    q = _rms_norm_padded(q, qn_ref[0, 0], spec.rms_norm_eps, d)
    k = _rms_norm_padded(k, kn_ref[0, 0], spec.rms_norm_eps, d)

    # RoPE with per-lane positions: freqs [B, DP] = pos * inv_freq_padded
    posf = pos_ref[:].astype(jnp.float32)  # [B, 1]
    freqs = posf * inv_ref[:]  # [B, DP]; pad lanes: freq 0 -> cos 1, sin 0
    cos = (jnp.cos(freqs) * spec.attention_scaling).astype(jnp.bfloat16)
    sin = (jnp.sin(freqs) * spec.attention_scaling).astype(jnp.bfloat16)
    rot = rot_ref[:]

    def rope(t, H):  # [B, H, DP]; rot's pad rows/cols are zero
        tr = jax.lax.dot_general(
            t.reshape(B * H, DP), rot, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(t.dtype).reshape(t.shape)
        return t * cos[:, None, :] + tr * sin[:, None, :]

    q = rope(q, Hq)
    k = rope(k, Hkv)

    # new K/V rows for the cache: un-pad [B, Hkv*DP] -> [B, nkv], then
    # quantize exactly like ops.kv_cache.quantize_kv_rows (per-row scale)
    kflat = jax.lax.dot_general(
        k.reshape(B, nkvp), eunp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    vflat = jax.lax.dot_general(
        vp, eunp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)

    def _quant(rows_bf16):
        rf = rows_bf16.astype(jnp.float32)
        scale = jnp.maximum(
            jnp.max(jnp.abs(rf), axis=1, keepdims=True) / 127.0, 1e-8
        )  # [B, 1]
        qr = jnp.clip(jnp.round(rf / scale), -127, 127).astype(jnp.int8)
        return qr, scale

    kq_new, ks_new = _quant(kflat)
    vq_new, vs_new = _quant(vflat)
    scl_ref[0] = jnp.concatenate(
        [ks_new, vs_new, jnp.zeros((B, DP - 2), jnp.float32)], axis=1
    )

    # wait for this layer's KV blocks (prefetched at the previous step)
    for dma in _reads(l, pane, step % 2):
        dma.wait()

    # stash the write windows: WROWS-aligned, history rows restored from the
    # freshly fetched block (bit-exact), new row inserted at woff
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (WROWS, nkv), 0)
    for b in range(B):
        wstart = (woff_ref[pane * B + b] // WROWS) * WROWS
        roff = woff_ref[pane * B + b] - wstart
        kwin = kbuf[step % 2, b, pl.ds(wstart, WROWS), :]
        vwin = vbuf[step % 2, b, pl.ds(wstart, WROWS), :]
        rowk[pane * B + b, l] = jnp.where(iota8 == roff, kq_new[b : b + 1, :], kwin)
        rowv[pane * B + b, l] = jnp.where(iota8 == roff, vq_new[b : b + 1, :], vwin)

    # --- attend-with-extension. Two formulations of identical math:
    #
    # batched (B >= 16): ONE pad-expansion matmul over all lanes'
    # windows ([B*bs, nkv] @ [nkv, Hkv*DP] — an MXU-shaped contraction
    # instead of B small ones) and batch-dim dot_generals for
    # scores/accumulate. The per-lane loop unrolls ~10 vector ops per
    # lane per group, so its instruction-issue overhead grows linearly
    # with B — measured 4.52 -> 3.01 ms/frame at B=32 (whole stack).
    #
    # per-lane loop (small B): lower latency at B<=8 where the batched
    # form's big intermediates don't pay for themselves.
    vpad3 = vp.reshape(B, Hkv, DP)
    kpad3 = k  # [B, Hkv, DP] current-token K (padded layout)
    if batched_attn:
        # Stage the int8->bf16 window casts in VMEM scratch: as dot_general
        # operands Mosaic would otherwise hold them live in vregs (measured:
        # 128M of register spills at B=16).
        kb16[:] = kbuf[step % 2].astype(jnp.bfloat16)
        vb16[:] = vbuf[step % 2].astype(jnp.bfloat16)
        mask3 = (
            jax.lax.broadcasted_iota(jnp.int32, (B, 1, block_size), 2)
            < woffv_ref[:].reshape(B, 1, 1)
        )
        if n_panes > 1:  # per-(l, p) block [1, B, 1, bs]
            sk3 = ksw_ref[0].reshape(B, 1, block_size)
            sv3 = vsw_ref[0].reshape(B, 1, block_size)
        else:  # full [L, B, 1, bs]
            sk3 = ksw_ref[l].reshape(B, 1, block_size)
            sv3 = vsw_ref[l].reshape(B, 1, block_size)
        gouts = []
        for g in range(Hkv):
            # scores in the FLAT cache domain: zero-embed the group's
            # padded q into the nkv columns (eunp's group slice); other
            # groups' columns are zero, so q_z . k_raw == q_g . k_g with
            # no pad-expansion of the window at all.
            qg3 = q[:, g * n_rep : (g + 1) * n_rep, :].astype(jnp.bfloat16)
            qz = jax.lax.dot_general(
                qg3.reshape(B * n_rep, DP),
                eunp_ref.at[pl.ds(g * DP, DP), :][:],     # [DP, nkv]
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16).reshape(B, n_rep, nkv)
            scores = jax.lax.dot_general(
                qz, kb16[:], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * (sk3 * spec.scale)                        # [B, n_rep, bs]
            scores = jnp.where(mask3, scores, NEG_INF)
            ext = jnp.sum(
                qg3.astype(jnp.float32)
                * kpad3[:, g : g + 1].astype(jnp.float32),
                axis=2, keepdims=True,
            ) * spec.scale                                # [B, n_rep, 1]
            m = jnp.maximum(jnp.max(scores, axis=2, keepdims=True), ext)
            p = jnp.exp(scores - m)
            pe = jnp.exp(ext - m)
            denom = jnp.sum(p, axis=2, keepdims=True) + pe
            acc_flat = jax.lax.dot_general(
                (p * sv3).astype(jnp.bfloat16), vb16[:],
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                             # [B, n_rep, nkv]
            # current-token V in the flat domain; other-group columns are
            # dropped by the epad group-slice below. Divide BEFORE the
            # (0/1 permutation) epad matmul so the single f32->bf16 round
            # happens at exactly the same point as the per-lane path —
            # keeps the two formulations bit-identical.
            acc_flat = acc_flat + pe * vflat[:, None, :].astype(jnp.float32)
            acc_pad = jax.lax.dot_general(
                (acc_flat / denom).astype(jnp.bfloat16).reshape(
                    B * n_rep, nkv
                ),
                epad_ref.at[:, pl.ds(g * DP, DP)][:],     # [nkv, DP]
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(B, n_rep, DP)
            gouts.append(acc_pad)
        attn = (
            jnp.concatenate(gouts, axis=1)
            .reshape(B, nqp)
            .astype(jnp.bfloat16)
        )
        h = h + _int8_mm(attn, o_q_ref.at[0], o_s_ref.at[0])
        xn2 = _rms_norm(h, ln2_ref[0], spec.rms_norm_eps)
        gu = _int8_mm(xn2, gu_q_ref.at[0], gu_s_ref.at[0])  # [B, 2I]
        I = gu.shape[-1] // 2
        g_ = gu[:, :I]
        sig = (1.0 / (1.0 + jnp.exp(-g_.astype(jnp.float32)))).astype(
            jnp.bfloat16
        )
        act = (g_ * sig) * gu[:, I:]
        h = h + _int8_mm(act, dn_q_ref.at[0], dn_s_ref.at[0])
        h_scr[pane] = h

        @pl.when(l == num_layers - 1)
        def _emit_b():
            hid_ref[:] = _rms_norm(h, fn_ref[:], spec.rms_norm_eps)

            def _writes():
                for b in range(B):
                    ws = (
                        tables_ref[pane * B + b] * block_size
                        + (woff_ref[pane * B + b] // WROWS) * WROWS
                    )
                    yield pltpu.make_async_copy(
                        rowk.at[pane * B + b], kq_out.at[:, pl.ds(ws, WROWS), :],
                        wsem.at[b, 0],
                    )
                    yield pltpu.make_async_copy(
                        rowv.at[pane * B + b], vq_out.at[:, pl.ds(ws, WROWS), :],
                        wsem.at[b, 1],
                    )

            for dma in _writes():
                dma.start()
            for dma in _writes():
                dma.wait()

        del _first_reads, _init, _prefetch, _emit_b
        return

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_size), 1)
    attn_rows = []
    for b in range(B):
        sk = ksw_ref[l, b]               # [1, bs] f32 per-slot scales
        sv = vsw_ref[l, b]
        # pad-expand the raw int8 window once per lane (int8 values are
        # exact in bf16; per-slot scales fold in AFTER the matmuls):
        # [bs, nkv] -> [bs, Hkv*DP]
        kw = jax.lax.dot_general(
            kbuf[step % 2, b].astype(jnp.bfloat16),
            epad_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(block_size, Hkv, DP)
        vw = jax.lax.dot_general(
            vbuf[step % 2, b].astype(jnp.bfloat16),
            epad_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(block_size, Hkv, DP)
        qb = q[b].astype(jnp.bfloat16)   # [Hq, DP]
        kb = kpad3[b].astype(jnp.bfloat16)  # [Hkv, DP] current-token K
        mask = lane_iota < woff_ref[b]   # [1, bs]
        outs = []
        for g in range(Hkv):
            qg = qb[g * n_rep : (g + 1) * n_rep]               # [n_rep, DP]
            kg = kw[:, g]                                       # [bs, DP]
            vg = vw[:, g]                                       # [bs, DP]
            scores = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (sk * spec.scale)                               # [n_rep, bs]
            scores = jnp.where(mask, scores, NEG_INF)
            # elementwise-and-reduce (a 1-row mixed-precision dot trips a
            # Mosaic vector.broadcast verifier bug)
            ext = jnp.sum(
                qg.astype(jnp.float32) * kb[g : g + 1].astype(jnp.float32),
                axis=1, keepdims=True,
            ) * spec.scale                                      # [n_rep, 1]
            m = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), ext)
            p = jnp.exp(scores - m)                             # [n_rep, bs]
            pe = jnp.exp(ext - m)                               # [n_rep, 1]
            denom = jnp.sum(p, axis=1, keepdims=True) + pe      # [n_rep, 1]
            acc = jax.lax.dot_general(
                (p * sv).astype(jnp.bfloat16), vg,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                    # [n_rep, DP]
            acc = acc + pe * vpad3[b, g : g + 1].astype(jnp.float32)
            outs.append(acc / denom)
        attn_rows.append(
            jnp.concatenate(outs, axis=0).reshape(1, nqp)
        )
    attn = jnp.concatenate(attn_rows, axis=0).astype(jnp.bfloat16)  # [B, nqp]

    h = h + _int8_mm(attn, o_q_ref.at[0], o_s_ref.at[0])
    xn2 = _rms_norm(h, ln2_ref[0], spec.rms_norm_eps)
    gu = _int8_mm(xn2, gu_q_ref.at[0], gu_s_ref.at[0])  # [B, 2I]
    I = gu.shape[-1] // 2
    g_ = gu[:, :I]
    sig = (1.0 / (1.0 + jnp.exp(-g_.astype(jnp.float32)))).astype(jnp.bfloat16)
    act = (g_ * sig) * gu[:, I:]
    h = h + _int8_mm(act, dn_q_ref.at[0], dn_s_ref.at[0])
    h_scr[pane] = h

    @pl.when(l == num_layers - 1)
    def _emit():
        hid_ref[:] = _rms_norm(h, fn_ref[:], spec.rms_norm_eps)
        # write all layers' new KV rows into the aliased cache planes
        def _writes():
            for b in range(B):
                ws = tables_ref[b] * block_size + (woff_ref[b] // WROWS) * WROWS
                yield pltpu.make_async_copy(
                    rowk.at[b], kq_out.at[:, pl.ds(ws, WROWS), :],
                    wsem.at[b, 0],
                )
                yield pltpu.make_async_copy(
                    rowv.at[b], vq_out.at[:, pl.ds(ws, WROWS), :],
                    wsem.at[b, 1],
                )

        for dma in _writes():
            dma.start()
        for dma in _writes():
            dma.wait()

    del _first_reads, _init, _prefetch, _emit


def make_burst_params(params: dict, spec: AttnSpec) -> dict | None:
    """Precompute the padded-head kernel weight layout. Returns None if the
    layout is unsupported.

    Runs as ONE jitted device program (weights never leave the device):
    built eagerly/host-side this was ~60 per-layer device round trips, which
    through a remote-relay backend cost minutes of engine-build time (the
    round-1 driver bench timeout)."""
    from nano_qwen3tts_tpu.ops.quant import QuantizedWeight

    lay = params["layers"]
    if (
        spec.qkv_bias
        or not isinstance(lay.get("qkv_w"), QuantizedWeight)
        or lay["qkv_w"].mode != "w8a8"
        or spec.head_dim > DP
    ):
        return None
    Hq, Hkv, d = spec.num_heads, spec.num_kv_heads, spec.head_dim
    nq, nkv = Hq * d, Hkv * d
    qkv, o_w = lay["qkv_w"], lay["o_w"]
    pad = DP - d

    def _build(qkv_q, qkv_s, o_q, q_norm, k_norm):
        L = qkv_q.shape[0]

        def pad_group(lo, n_heads):  # cols [L, D, H*d] -> [L, D, H*DP]
            g = jax.lax.dynamic_slice_in_dim(qkv_q, lo, n_heads * d, axis=2)
            g = g.reshape(L, -1, n_heads, d)
            g = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, pad)))
            return g.reshape(L, -1, n_heads * DP)

        def pad_scale(lo, n_heads):  # [L, H*d] -> [L, H*DP], pad lanes = 1
            s = jax.lax.dynamic_slice_in_dim(qkv_s, lo, n_heads * d, axis=1)
            s = s.reshape(L, n_heads, d)
            s = jnp.pad(s, ((0, 0), (0, 0), (0, pad)), constant_values=1.0)
            return s.reshape(L, n_heads * DP)

        qkv_qp = jnp.concatenate(
            [pad_group(0, Hq), pad_group(nq, Hkv), pad_group(nq + nkv, Hkv)],
            axis=2,
        )
        qkv_sp = jnp.concatenate(
            [pad_scale(0, Hq), pad_scale(nq, Hkv), pad_scale(nq + nkv, Hkv)],
            axis=1,
        )
        # o_w: zero ROWS at pad positions ([L, nq, D] -> [L, Hq*DP, D])
        ow = o_q.reshape(L, Hq, d, -1)
        ow_p = jnp.pad(ow, ((0, 0), (0, 0), (0, pad), (0, 0)))
        o_qp = ow_p.reshape(L, Hq * DP, -1)
        # [L, d] norm weights -> [L, DP] (pad lanes zero)
        qn = jnp.pad(q_norm.astype(jnp.bfloat16), ((0, 0), (0, pad)))
        kn = jnp.pad(k_norm.astype(jnp.bfloat16), ((0, 0), (0, pad)))
        return qkv_qp, qkv_sp, o_qp, qn, kn

    qkv_qp, qkv_sp, o_qp, qn, kn = jax.jit(_build)(
        qkv.q, qkv.s, o_w.q, lay["q_norm"], lay["k_norm"]
    )

    # Position-independent constants: built host-side (no device data).
    inv = 1.0 / (
        np.float32(spec.rope_theta)
        ** (np.arange(0, d, 2, dtype=np.float32) / np.float32(d))
    )
    inv_p = np.zeros(DP, np.float32)
    inv_p[:d] = np.concatenate([inv, inv])
    rot = np.zeros((DP, DP), np.float32)
    hh = d // 2
    for i in range(hh):
        rot[i + hh, i] = -1.0
        rot[i, i + hh] = 1.0
    epad = np.zeros((nkv, Hkv * DP), np.float32)  # cache cols -> padded cols
    for g in range(Hkv):
        for j in range(d):
            epad[g * d + j, g * DP + j] = 1.0

    from nano_qwen3tts_tpu.ops.quant import QuantizedWeight as QW

    return {
        "qkv_w": QW(qkv_qp, qkv_sp, "w8a8"),
        "o_w": QW(o_qp, o_w.s, "w8a8"),
        "q_norm": qn,
        "k_norm": kn,
        "inv_freq": jnp.asarray(inv_p[None, :]),
        "rot": jnp.asarray(rot, jnp.bfloat16),
        "epad": jnp.asarray(epad, jnp.bfloat16),
        "eunpad": jnp.asarray(epad.T, jnp.bfloat16),
    }


def supports_talker_burst(params: dict, spec: AttnSpec, k_cache, B: int,
                          block_size: int, max_model_len: int) -> bool:
    from nano_qwen3tts_tpu.ops.kv_cache import QuantizedKV

    return (
        "talker_burst" in params
        and isinstance(k_cache, QuantizedKV)
        and block_size == max_model_len
        and block_size % WROWS == 0
        # <=32 lanes: single-pane kernel (compile-checked at 32 on v5e).
        # Larger buckets must split into equal <=32-lane panes — the
        # (L, n_panes) grid keeps per-step compile complexity at the
        # 32-lane point while streaming weights once per layer.
        and (B <= 32 or B % ((B + 31) // 32) == 0)
        and B <= 128
    )


def talker_stack_burst(
    params: dict,
    spec: AttnSpec,
    x: jax.Array,            # [B, D] bf16 frame embeddings
    positions: jax.Array,    # [B] int32 rope positions
    block_tables: jax.Array, # [B, NB] int32 (only column 0 is used: NB==1)
    kv_lens: jax.Array,      # [B] int32 valid entries incl. this write
    k_cache,                 # QuantizedKV: flat [L, S, Hkv*d] + [L, S]
    v_cache,
    block_size: int,
    interpret: bool = False,
    pane_size: int | None = None,  # tests: force a pane split at small B
):
    """Whole talker decode stack in one kernel, cache updated IN PLACE.

    Returns (hidden [B, D] post-final-norm, k_cache', v_cache') — the int8
    value planes are aliased through the kernel (new rows DMA-written
    in-kernel), the scale planes are updated with one XLA scatter. No
    XLA-visible read or copy of the value planes ever happens, so the
    donated multi-frame scan carry stays in place. ``params`` must carry
    the ``"talker_burst"`` layout from make_burst_params.
    """
    from nano_qwen3tts_tpu.ops.kv_cache import QuantizedKV

    lay = params["layers"]
    bp = params["talker_burst"]
    B, D = x.shape
    L = lay["input_layernorm"].shape[0]
    Hkv, d = spec.num_kv_heads, spec.head_dim
    nkv = Hkv * d
    S = k_cache.q.shape[1]
    assert k_cache.q.shape[-1] == nkv, "QuantizedKV value plane must be flat"


    tables = block_tables[:, 0].astype(jnp.int32)
    woff = jnp.clip(kv_lens - 1, 0, block_size - 1).astype(jnp.int32)

    kq = k_cache.q  # flat [L, S, nkv] — NO reshape (a 4-D cache layout puts
    vq = v_cache.q  # S minor-most and reshaping relayouts the whole plane)
    # gather each lane's scale window [L, B, 1, bs]: the unit dim keeps l/b
    # on untiled leading axes (a [.., bs, 1] layout would be lane-padded
    # 128x and materialize the whole scale plane per frame — see module doc)
    win = tables[:, None] * block_size + jnp.arange(block_size, dtype=jnp.int32)
    ksw = k_cache.s[:, win][:, :, None, :]
    vsw = v_cache.s[:, win][:, :, None, :]

    # Pane tiling (the 64+-lane tier): run the grid as (L, n_panes) with a
    # <=32-lane pane per step — see _stack_kernel docstring.
    if pane_size is not None:
        n_panes = (B + pane_size - 1) // pane_size
    else:
        n_panes = 1 if B <= 32 else (B + 31) // 32
    assert B % n_panes == 0, f"batch {B} not divisible into 32-lane panes"
    Bp = B // n_panes

    def _mid1(a, dtype=jnp.float32):
        return a.astype(dtype).reshape(a.shape[0], 1, a.shape[1])

    # NOTE: under PrefetchScalarGridSpec every index map receives the scalar
    # refs after the grid indices — hence the (grid..., tables, woff)
    # signatures.
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    if n_panes == 1:
        grid = (L,)
        wspec = lambda shape: pl.BlockSpec(shape, lambda l, t, w: (0,) * (len(shape) - 3) + (l, 0, 0))  # noqa: E731
        lane = lambda shape: vmem  # noqa: E731
        swspec = vmem
        sclspec = pl.BlockSpec((1, B, DP), lambda l, t, w: (l, 0, 0))
        hidspec = vmem
    else:
        grid = (L, n_panes)
        wspec = lambda shape: pl.BlockSpec(shape, lambda l, p, t, w: (0,) * (len(shape) - 3) + (l, 0, 0))  # noqa: E731
        # per-pane lane blocks (leading Bp-slice of a B-long axis)
        lane = lambda shape: pl.BlockSpec(shape, lambda l, p, t, w: (p,) + (0,) * (len(shape) - 1))  # noqa: E731
        swspec = pl.BlockSpec(
            (1, Bp, 1, block_size), lambda l, p, t, w: (l, p, 0, 0)
        )
        sclspec = pl.BlockSpec((1, Bp, DP), lambda l, p, t, w: (l, p, 0))
        hidspec = pl.BlockSpec((Bp, D), lambda l, p, t, w: (p, 0))
    qkv_w, o_w = bp["qkv_w"], bp["o_w"]
    gu_w, dn_w = lay["gateup_w"], lay["down_w"]

    in_specs = [
        lane((Bp, D)),  # x
        lane((Bp, 1)),  # positions
        lane((Bp, 1)),  # woff vector (batched-attention masks)
        wspec((1,) + qkv_w.q.shape[1:]), wspec((1, 1, qkv_w.s.shape[-1])),
        wspec((1,) + o_w.q.shape[1:]), wspec((1, 1, o_w.s.shape[-1])),
        wspec((1,) + gu_w.q.shape[1:]), wspec((1, 1, gu_w.s.shape[-1])),
        wspec((1,) + dn_w.q.shape[1:]), wspec((1, 1, dn_w.s.shape[-1])),
        wspec((1, 1, D)),                            # ln1
        wspec((1, 1, D)),                            # ln2
        wspec((1, 1, DP)),                           # q_norm (padded)
        wspec((1, 1, DP)),                           # k_norm (padded)
        vmem,  # final norm
        vmem,  # inv_freq
        vmem,  # rot
        vmem,  # epad
        vmem,  # eunpad
    ]
    in_specs += [swspec, swspec]  # ksw, vsw gathered scale windows
    in_specs += [any_spec, any_spec]  # kq, vq value planes (stay in HBM)

    # flattened input indices for the aliased value planes: 2 scalar-prefetch
    # args + the in_specs list above
    n_before = 2 + len(in_specs) - 2
    aliases = {n_before: 2, n_before + 1: 3}

    import os

    env = os.environ.get("NANO_TTS_BURST_BATCHED_ATTN")
    batched_attn = (
        True if n_panes > 1 else ((B >= 16) if env is None else env == "1")
    )
    kernel = functools.partial(
        _stack_kernel, spec=spec, num_layers=L, B=Bp, D=D,
        block_size=block_size, batched_attn=batched_attn, n_panes=n_panes,
    )
    hid, scl, kq_new, vq_new = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                hidspec,
                sclspec,
                any_spec,
                any_spec,
            ],
            scratch_shapes=[
                pltpu.VMEM((n_panes, Bp, D), jnp.bfloat16),       # h
                pltpu.VMEM((2, Bp, block_size, nkv), jnp.int8),   # kbuf
                pltpu.VMEM((2, Bp, block_size, nkv), jnp.int8),   # vbuf
                pltpu.VMEM((B, L, WROWS, nkv), jnp.int8),         # rowk
                pltpu.VMEM((B, L, WROWS, nkv), jnp.int8),         # rowv
                pltpu.SemaphoreType.DMA((2, Bp, 2)),              # read sems
                pltpu.SemaphoreType.DMA((Bp, 2)),                 # write sems
            ] + (
                [
                    pltpu.VMEM((Bp, block_size, nkv), jnp.bfloat16),  # kb16
                    pltpu.VMEM((Bp, block_size, nkv), jnp.bfloat16),  # vb16
                ]
                if batched_attn
                else []
            ),
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, DP), jnp.float32),
            jax.ShapeDtypeStruct((L, S, nkv), jnp.int8),
            jax.ShapeDtypeStruct((L, S, nkv), jnp.int8),
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",) * len(grid),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        tables,  # scalar prefetch
        woff,
        x.astype(jnp.bfloat16),
        positions.reshape(B, 1).astype(jnp.int32),
        woff.reshape(B, 1),
        qkv_w.q, _mid1(qkv_w.s),
        o_w.q, _mid1(o_w.s),
        gu_w.q, _mid1(gu_w.s),
        dn_w.q, _mid1(dn_w.s),
        _mid1(lay["input_layernorm"], jnp.bfloat16),
        _mid1(lay["post_attention_layernorm"], jnp.bfloat16),
        bp["q_norm"].reshape(L, 1, DP),
        bp["k_norm"].reshape(L, 1, DP),
        params["norm"].astype(jnp.bfloat16).reshape(1, -1),
        bp["inv_freq"], bp["rot"], bp["epad"], bp["eunpad"],
        ksw, vsw,
        kq, vq,
    )
    # scale planes: one in-place scatter per cache (values were written
    # in-kernel through the aliased planes)
    slots = tables * block_size + woff
    ks2 = k_cache.s.at[:, slots].set(scl[:, :, 0], mode="drop")
    vs2 = v_cache.s.at[:, slots].set(scl[:, :, 1], mode="drop")
    return (
        hid.astype(x.dtype),
        QuantizedKV(kq_new, ks2),
        QuantizedKV(vq_new, vs2),
    )
