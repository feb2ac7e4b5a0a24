"""Talker burst Pallas kernel vs the XLA attend-with-extension stack.

The kernel (ops/talker_burst_pallas.py) runs the whole talker decode stack
in one pallas_call with a padded-head weight layout; it reorders bf16/int8
accumulations, so outputs agree with the XLA path only to rounding, which
compounds through the (unnormalized random-weight) layer stack — hence the
relative tolerance. Runs in interpret mode on CPU; the real-chip compile
and speed (2.6x the XLA stack at batch 8 on v5e) are exercised by bench.py
with BENCH_ATTN=burst.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_qwen3tts_tpu.config import TalkerConfig
from nano_qwen3tts_tpu.models.talker import talker_spec
from nano_qwen3tts_tpu.models.transformer import (
    fuse_layer_stack,
    stack_decode_paged,
)
from nano_qwen3tts_tpu.models.weights import host_random_init, init_talker_params
from nano_qwen3tts_tpu.ops.kv_cache import (
    QuantizedKV,
    make_kv_cache_int8,
    quantize_kv_rows,
)
from nano_qwen3tts_tpu.ops.quant import quantize_talker_params
from nano_qwen3tts_tpu.ops.talker_burst_pallas import (
    make_burst_params,
    supports_talker_burst,
    talker_stack_burst,
)

TC = TalkerConfig(
    hidden_size=256, intermediate_size=512, num_hidden_layers=4,
    num_attention_heads=4, num_key_value_heads=2, head_dim=64,
    vocab_size=128,
)


@pytest.fixture(scope="module")
def setup():
    spec = talker_spec(TC)
    with host_random_init():
        params = init_talker_params(TC, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params.pop("text_embedding", None)
    params.pop("text_projection", None)
    params = dict(params, layers=fuse_layer_stack(params["layers"]))
    params = quantize_talker_params(params, "w8a8")
    bp = make_burst_params(params, spec)
    assert bp is not None
    params = dict(params, talker_burst=bp)
    return spec, params


def _seeded_cache(L, bs, tables, hist, rng):
    B = len(tables)
    kc, vc = make_kv_cache_int8(L, 2 + B, bs, 2, 64)
    kq = np.asarray(kc.q).copy()
    ks = np.asarray(kc.s).copy()
    vq = np.asarray(vc.q).copy()
    vs = np.asarray(vc.s).copy()
    for b in range(B):
        s0 = tables[b, 0] * bs
        raw_k = rng.standard_normal((L, hist, 2, 64)).astype(np.float32) * 0.3
        raw_v = rng.standard_normal((L, hist, 2, 64)).astype(np.float32) * 0.3
        kr, krs = quantize_kv_rows(jnp.asarray(raw_k).reshape(L * hist, 2, 64))
        vr, vrs = quantize_kv_rows(jnp.asarray(raw_v).reshape(L * hist, 2, 64))
        kq[:, s0 : s0 + hist] = np.asarray(kr).reshape(L, hist, 128)
        ks[:, s0 : s0 + hist] = np.asarray(krs).reshape(L, hist)
        vq[:, s0 : s0 + hist] = np.asarray(vr).reshape(L, hist, 128)
        vs[:, s0 : s0 + hist] = np.asarray(vrs).reshape(L, hist)
    return (
        QuantizedKV(jnp.asarray(kq), jnp.asarray(ks)),
        QuantizedKV(jnp.asarray(vq), jnp.asarray(vs)),
    )


def test_burst_matches_xla_stack(setup, rng):
    spec, params = setup
    B, bs, hist = 4, 128, 50
    L = TC.num_hidden_layers
    tables = np.arange(1, B + 1, dtype=np.int32).reshape(B, 1)
    kc, vc = _seeded_cache(L, bs, tables, hist, rng)
    x = jnp.asarray(rng.standard_normal((B, TC.hidden_size)) * 0.3, jnp.bfloat16)
    positions = jnp.full((B,), hist + 1, jnp.int32)
    kv_lens = jnp.full((B,), hist + 1, jnp.int32)
    slots = jnp.asarray(tables[:, 0] * bs + hist)
    bt = jnp.asarray(tables)

    assert supports_talker_burst(params, spec, kc, B, bs, bs)
    hid_ref, kc2, vc2 = stack_decode_paged(
        params["layers"], params["norm"], x, positions, slots, bt, kv_lens,
        kc, vc, spec, bs, "xla",
    )
    hid, kc3, vc3 = talker_stack_burst(
        params, spec, x, positions, bt, kv_lens, kc, vc, bs, interpret=True,
    )
    a = np.asarray(hid_ref, np.float32)
    b = np.asarray(hid, np.float32)
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 5e-2

    # the kernel's in-place cache writes must match what the XLA path
    # scattered (reference rows are int8 round trips -> ~1% of scale);
    # history rows (restored bit-exact by the write window) must be intact
    for ref_c, got_c in ((kc2, kc3), (vc2, vc3)):
        q_ref = np.asarray(ref_c.q, np.float32)
        s_ref = np.asarray(ref_c.s)
        q_got = np.asarray(got_c.q, np.float32)
        s_got = np.asarray(got_c.s)
        for i in range(B):
            s = int(slots[i])
            ref_row = q_ref[:, s] * s_ref[:, s][:, None]
            got_row = q_got[:, s] * s_got[:, s][:, None]
            scale = np.abs(ref_row).max() + 1e-9
            assert np.abs(ref_row - got_row).max() / scale < 3e-2
            # history rows below the write offset: bit-identical
            lo = int(tables[i, 0]) * bs
            np.testing.assert_array_equal(
                q_got[:, lo : lo + hist], q_ref[:, lo : lo + hist]
            )
            np.testing.assert_allclose(
                s_got[:, lo : lo + hist], s_ref[:, lo : lo + hist]
            )


def test_paned_burst_matches_single_pane(setup, rng, monkeypatch):
    """The (L, n_panes) pane grid (the 64+-lane compile-budget form) must be
    BIT-IDENTICAL to the flat single-pane kernel: each pane runs exactly the
    batched-attention math on its lane slice, and the per-layer weight
    stream/DMA choreography must not perturb results or clobber other
    panes' cache rows."""
    monkeypatch.setenv("NANO_TTS_BURST_BATCHED_ATTN", "1")
    spec, params = setup
    B, bs, hist = 8, 128, 50
    L = TC.num_hidden_layers
    tables = np.arange(1, B + 1, dtype=np.int32).reshape(B, 1)
    kc, vc = _seeded_cache(L, bs, tables, hist, rng)
    x = jnp.asarray(rng.standard_normal((B, TC.hidden_size)) * 0.3, jnp.bfloat16)
    positions = jnp.full((B,), hist + 1, jnp.int32)
    kv_lens = jnp.full((B,), hist + 1, jnp.int32)
    bt = jnp.asarray(tables)

    hid1, kc1, vc1 = talker_stack_burst(
        params, spec, x, positions, bt, kv_lens, kc, vc, bs, interpret=True,
    )
    hid2, kc2, vc2 = talker_stack_burst(
        params, spec, x, positions, bt, kv_lens, kc, vc, bs, interpret=True,
        pane_size=4,
    )
    np.testing.assert_array_equal(np.asarray(hid1), np.asarray(hid2))
    for c1, c2 in ((kc1, kc2), (vc1, vc2)):
        np.testing.assert_array_equal(np.asarray(c1.q), np.asarray(c2.q))
        np.testing.assert_array_equal(np.asarray(c1.s), np.asarray(c2.s))


def test_burst_requires_one_block_per_lane(setup, rng):
    spec, params = setup
    kc, _ = make_kv_cache_int8(TC.num_hidden_layers, 8, 64, 2, 64)
    # block_size (64) != max_model_len (128) -> unsupported
    assert not supports_talker_burst(params, spec, kc, 4, 64, 128)
    # bf16 cache -> unsupported
    from nano_qwen3tts_tpu.ops.kv_cache import make_kv_cache

    kbf, _ = make_kv_cache(TC.num_hidden_layers, 8, 64, 2, 64)
    assert not supports_talker_burst(params, spec, kbf, 4, 64, 64)
