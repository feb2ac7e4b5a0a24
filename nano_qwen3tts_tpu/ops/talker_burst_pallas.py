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
* each lane's KV region is ONE cache block (requires
  ``kvcache_block_size == max_model_len``, i.e. one contiguous block per
  sequence — the block manager is unchanged, NB is just 1), streamed per
  layer via scalar-prefetched block-table index maps;
* attention is attend-with-extension, exactly like the XLA fallback
  (ops/paged_attention_pallas.paged_decode_attention_extend_int8_xla):
  the current token's K/V stay in registers, int8 window dequant is folded
  into the scores/probs as per-slot scales;
* the residual stream lives in VMEM scratch across grid steps; the new
  K/V rows are kernel outputs, written back to the paged cache by the
  caller with the same deferred dynamic-update-slices as the XLA path.

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
    tables_ref,  # [B] int32 (one block id per lane)
    # inputs
    x_ref,            # [B, D] bf16
    pos_ref,          # [B, 1] int32 rope positions
    nex_ref,          # [B, 1] int32 existing KV entries (kv_len - 1)
    qkv_q_ref, qkv_s_ref, o_q_ref, o_s_ref,
    gu_q_ref, gu_s_ref, dn_q_ref, dn_s_ref,
    ln1_ref, ln2_ref, qn_ref, kn_ref, fn_ref,
    inv_ref,          # [1, DP] f32 inv_freq (padded-head pattern, pads 0)
    rot_ref,          # [DP, DP] bf16 rotate-half matrix (pads 0)
    epad_ref,         # [nkv, Hkv*DP] bf16 0/1 pad-expansion for cache K/V
    eunp_ref,         # [Hkv*DP, nkv] bf16 0/1 un-pad for new K/V rows
    *rest,
    spec: AttnSpec, num_layers: int, B: int, D: int, block_size: int,
):
    # rest = B k-blocks, B k-scales, B v-blocks, B v-scales, then outputs
    # (hid, k_rows, v_rows), then scratch (h)
    kq_refs = rest[0 * B : 1 * B]          # each [1, 1, bs, nkv] int8
    ks_refs = rest[1 * B : 2 * B]          # each [1, 1, bs, 1] f32
    vq_refs = rest[2 * B : 3 * B]
    vs_refs = rest[3 * B : 4 * B]
    hid_ref, krows_ref, vrows_ref = rest[4 * B : 4 * B + 3]
    h_scr = rest[4 * B + 3]

    l = pl.program_id(0)
    Hq, Hkv, d = spec.num_heads, spec.num_kv_heads, spec.head_dim
    nqp, nkvp = Hq * DP, Hkv * DP
    n_rep = Hq // Hkv

    @pl.when(l == 0)
    def _init():
        h_scr[:] = x_ref[:]

    h = h_scr[:]
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

    # new K/V rows for the cache: un-pad [B, Hkv*DP] -> [B, nkv]
    kflat = k.reshape(B, nkvp)
    krows_ref[0] = jax.lax.dot_general(
        kflat, eunp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)
    vrows_ref[0] = jax.lax.dot_general(
        vp, eunp_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.bfloat16)

    # --- attend-with-extension, one lane at a time (each lane's KV block
    # is its own streamed input; B is a small bucket constant)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, block_size), 1)
    vpad3 = vp.reshape(B, Hkv, DP)
    attn_rows = []
    for b in range(B):
        sk = ks_refs[b][0, 0]            # [bs, 1] f32 per-slot scales
        sv = vs_refs[b][0, 0]
        # pad-expand the int8 window once per lane: [bs, nkv] -> [bs, Hkv*DP]
        kw = jax.lax.dot_general(
            (kq_refs[b][0, 0].astype(jnp.float32) * sk).astype(jnp.bfloat16),
            epad_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(block_size, Hkv, DP)
        vw = jax.lax.dot_general(
            (vq_refs[b][0, 0].astype(jnp.float32) * sv).astype(jnp.bfloat16),
            epad_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16).reshape(block_size, Hkv, DP)
        qb = q[b].astype(jnp.bfloat16)   # [Hq, DP]
        kb = k[b].astype(jnp.bfloat16)   # [Hkv, DP] current-token K
        mask = lane_iota < nex_ref[b, 0]  # [1, bs]
        outs = []
        for g in range(Hkv):
            qg = qb[g * n_rep : (g + 1) * n_rep]               # [n_rep, DP]
            kg = kw[:, g]                                       # [bs, DP]
            vg = vw[:, g]                                       # [bs, DP]
            scores = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * spec.scale                                      # [n_rep, bs]
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
                p.astype(jnp.bfloat16), vg,
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
    h_scr[:] = h

    @pl.when(l == num_layers - 1)
    def _emit():
        hid_ref[:] = _rms_norm(h, fn_ref[:], spec.rms_norm_eps)

    del _init, _emit


def _pad_cols_int8(wq, ws, H, d):
    """Pad each head's d output-channel block to DP lanes (zero cols)."""
    O = wq.shape[0]
    wq3 = np.asarray(wq).reshape(O, H, d)
    ws2 = np.asarray(ws).reshape(H, d)
    wq_p = np.zeros((O, H, DP), np.int8)
    ws_p = np.ones((H, DP), np.float32)
    wq_p[:, :, :d] = wq3
    ws_p[:, :d] = ws2
    return wq_p.reshape(O, H * DP), ws_p.reshape(H * DP)


def make_burst_params(params: dict, spec: AttnSpec) -> dict | None:
    """Precompute the padded-head kernel weight layout (host-side, once at
    engine build). Returns None if the layout is unsupported."""
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
    L = lay["input_layernorm"].shape[0]
    qkv, o_w = lay["qkv_w"], lay["o_w"]

    qkv_qp, qkv_sp, o_qp = [], [], []
    for l in range(L):
        wq = np.asarray(qkv.q[l])  # [D, nq+2nkv]
        ws = np.asarray(qkv.s[l])
        parts_q, parts_s = [], []
        for (lo, hi, H) in ((0, nq, Hq), (nq, nq + nkv, Hkv), (nq + nkv, nq + 2 * nkv, Hkv)):
            pq, ps = _pad_cols_int8(wq[:, lo:hi], ws[lo:hi], H, d)
            parts_q.append(pq)
            parts_s.append(ps)
        qkv_qp.append(np.concatenate(parts_q, axis=1))
        qkv_sp.append(np.concatenate(parts_s))
        # o_w: zero ROWS at pad positions ([nq, D] -> [Hq*DP, D])
        ow = np.asarray(o_w.q[l]).reshape(Hq, d, -1)
        ow_p = np.zeros((Hq, DP, ow.shape[-1]), np.int8)
        ow_p[:, :d] = ow
        o_qp.append(ow_p.reshape(Hq * DP, -1))

    from nano_qwen3tts_tpu.ops.quant import QuantizedWeight as QW

    def _pad_vec(v):  # [d] norm weight -> [DP] (pad lanes zero)
        out = np.zeros(DP, v.dtype)
        out[:d] = np.asarray(v)
        return out

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

    qn = np.stack([_pad_vec(np.asarray(lay["q_norm"][l])) for l in range(L)])
    kn = np.stack([_pad_vec(np.asarray(lay["k_norm"][l])) for l in range(L)])
    return {
        "qkv_w": QW(jnp.asarray(np.stack(qkv_qp)), jnp.asarray(np.stack(qkv_sp)), "w8a8"),
        "o_w": QW(jnp.asarray(np.stack(o_qp)), o_w.s, "w8a8"),
        "q_norm": jnp.asarray(qn, jnp.bfloat16),
        "k_norm": jnp.asarray(kn, jnp.bfloat16),
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
        and B <= 16  # 4*B streamed KV inputs; fall back for huge buckets
    )


def talker_stack_burst(
    params: dict,
    spec: AttnSpec,
    x: jax.Array,            # [B, D] bf16 frame embeddings
    positions: jax.Array,    # [B] int32 rope positions
    block_tables: jax.Array, # [B, NB] int32 (only column 0 is used: NB==1)
    kv_lens: jax.Array,      # [B] int32 valid entries incl. this write
    k_cache,                 # QuantizedKV [L, S, Hkv, d] + [L, S]
    v_cache,
    block_size: int,
    interpret: bool = False,
):
    """Whole talker decode stack in one kernel.

    Returns (hidden [B, D] post-final-norm, k_rows [L, B, Hkv, d] bf16,
    v_rows) — the caller scatters the rows into the cache exactly like
    transformer.stack_decode_paged's deferred-write tail. ``params`` must
    carry the ``"talker_burst"`` layout from make_burst_params.
    """
    lay = params["layers"]
    bp = params["talker_burst"]
    B, D = x.shape
    L = lay["input_layernorm"].shape[0]
    Hkv, d = spec.num_kv_heads, spec.head_dim
    nkv = Hkv * d
    n_blocks = k_cache.q.shape[1] // block_size

    kq = k_cache.q.reshape(L, n_blocks, block_size, nkv)
    ks = k_cache.s.reshape(L, n_blocks, block_size, 1)
    vq = v_cache.q.reshape(L, n_blocks, block_size, nkv)
    vs = v_cache.s.reshape(L, n_blocks, block_size, 1)

    def _mid1(a, dtype=jnp.float32):
        return a.astype(dtype).reshape(a.shape[0], 1, a.shape[1])

    # NOTE: under PrefetchScalarGridSpec every index map receives the scalar
    # refs after the grid indices — hence the (l, tables) signatures.
    wspec = lambda shape: pl.BlockSpec(shape, lambda l, tables: (l, 0, 0))  # noqa: E731
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    qkv_w, o_w = bp["qkv_w"], bp["o_w"]
    gu_w, dn_w = lay["gateup_w"], lay["down_w"]

    in_specs = [
        vmem,  # x
        vmem,  # positions
        vmem,  # n_exist
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
    # per-lane KV blocks: index maps close over the lane's table entry
    def kv_spec(shape2):
        specs = []
        for b in range(B):
            specs.append(
                pl.BlockSpec(
                    (1, 1) + shape2,
                    lambda l, tables, b=b: (l, tables[b], 0, 0),
                )
            )
        return specs

    in_specs += kv_spec((block_size, nkv))  # k blocks
    in_specs += kv_spec((block_size, 1))    # k scales
    in_specs += kv_spec((block_size, nkv))  # v blocks
    in_specs += kv_spec((block_size, 1))    # v scales

    kernel = functools.partial(
        _stack_kernel, spec=spec, num_layers=L, B=B, D=D,
        block_size=block_size,
    )
    hid, k_rows, v_rows = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L,),
            in_specs=in_specs,
            out_specs=[
                vmem,
                pl.BlockSpec((1, B, nkv), lambda l, tables: (l, 0, 0)),
                pl.BlockSpec((1, B, nkv), lambda l, tables: (l, 0, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((B, D), jnp.bfloat16)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, nkv), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, B, nkv), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        block_tables[:, 0].astype(jnp.int32),  # scalar prefetch
        x.astype(jnp.bfloat16),
        positions.reshape(B, 1).astype(jnp.int32),
        (kv_lens - 1).reshape(B, 1).astype(jnp.int32),
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
        # the same cache arrays passed once per lane — each positional
        # argument pairs with its lane's BlockSpec (index map table[b])
        *([kq] * B), *([ks] * B), *([vq] * B), *([vs] * B),
    )
    return (
        hid.astype(x.dtype),
        k_rows.reshape(L, B, Hkv, d),
        v_rows.reshape(L, B, Hkv, d),
    )
