"""Golden tests: JAX models vs independent numpy reference (float32)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import ref_impl
from nano_qwen3tts_tpu.config import preset_config
from nano_qwen3tts_tpu.models import predictor as P
from nano_qwen3tts_tpu.models import talker as T
from nano_qwen3tts_tpu.models.transformer import (
    AttnSpec,
    apply_rope,
    make_inv_freq,
    rms_norm,
)
from nano_qwen3tts_tpu.models.weights import init_predictor_params, init_talker_params
from nano_qwen3tts_tpu.ops.attention import (
    dense_prefill_attention,
    paged_decode_attention_xla,
)
from nano_qwen3tts_tpu.ops.kv_cache import make_kv_cache, prefill_slot_mapping, write_kv

CFG = preset_config("tiny")
TCFG = CFG.talker_config
PCFG = TCFG.code_predictor_config
TSPEC = AttnSpec.from_model_config(
    type("M", (), {
        "num_attention_heads": TCFG.num_attention_heads,
        "num_key_value_heads": TCFG.num_key_value_heads,
        "head_dim": TCFG.actual_head_dim,
        "rms_norm_eps": TCFG.rms_norm_eps,
        "rope_theta": TCFG.rope_theta,
        "attention_scaling": 1.0,
        "attention_bias": TCFG.attention_bias,
    })()
)


def test_rms_norm_matches_numpy(rng):
    x = rng.standard_normal((4, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6))
    want = ref_impl.rms_norm(x, w, 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rope_matches_numpy(rng):
    T_, H, d = 5, 3, 8
    x = rng.standard_normal((T_, H, d)).astype(np.float32)
    pos = np.array([0, 1, 2, 7, 9], np.int32)
    inv = make_inv_freq(d, 10000.0)
    got = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos), inv, 0.7))
    want = ref_impl.rope(x, pos, 10000.0, 0.7)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dense_prefill_attention_vs_numpy(rng):
    B, T_, Hq, Hkv, d = 2, 6, 4, 2, 8
    q = rng.standard_normal((B, T_, Hq, d)).astype(np.float32)
    k = rng.standard_normal((B, T_, Hkv, d)).astype(np.float32)
    v = rng.standard_normal((B, T_, Hkv, d)).astype(np.float32)
    lengths = np.array([6, 4])
    valid = np.arange(T_)[None, :] < lengths[:, None]
    got = np.asarray(
        dense_prefill_attention(*map(jnp.asarray, (q, k, v)), jnp.asarray(valid), d**-0.5)
    )
    for b in range(B):
        L = lengths[b]
        want = ref_impl.causal_attention(q[b, :L], k[b, :L], v[b, :L], d**-0.5)
        np.testing.assert_allclose(got[b, :L], want, rtol=1e-4, atol=1e-4)


def test_paged_decode_attention_vs_dense(rng):
    """Paged decode (gathered from a blocked cache) == dense attention."""
    B, Hq, Hkv, d, bs, NB = 2, 4, 2, 8, 4, 3
    S = 16 * bs
    kv_lens = np.array([7, 10], np.int32)
    q = rng.standard_normal((B, Hq, d)).astype(np.float32)
    kc = np.zeros((S, Hkv, d), np.float32)
    vc = np.zeros((S, Hkv, d), np.float32)
    tables = np.array([[5, 9, 0], [2, 11, 3]], np.int32)
    ctx = {}
    for b in range(B):
        ks = rng.standard_normal((kv_lens[b], Hkv, d)).astype(np.float32)
        vs = rng.standard_normal((kv_lens[b], Hkv, d)).astype(np.float32)
        for t in range(kv_lens[b]):
            slot = tables[b][t // bs] * bs + t % bs
            kc[slot], vc[slot] = ks[t], vs[t]
        ctx[b] = (ks, vs)
    got = np.asarray(
        paged_decode_attention_xla(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(tables), jnp.asarray(kv_lens), bs, d**-0.5,
        )
    )
    for b in range(B):
        ks, vs = ctx[b]
        want = ref_impl.causal_attention(q[b][None], ks, vs, d**-0.5)[0]
        np.testing.assert_allclose(got[b], want, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def talker_params():
    return init_talker_params(TCFG, jax.random.PRNGKey(0), dtype=jnp.float32)


@pytest.fixture(scope="module")
def pred_params():
    return init_predictor_params(PCFG, jax.random.PRNGKey(1), dtype=jnp.float32)


class TestTalker:
    def test_prefill_matches_numpy(self, talker_params, rng):
        spec = T.talker_spec(TCFG)
        L = 7
        emb = rng.standard_normal((L, TCFG.hidden_size)).astype(np.float32) * 0.5
        # single sequence padded to T=8
        T_pad = 8
        embeds = np.zeros((1, T_pad, TCFG.hidden_size), np.float32)
        embeds[0, :L] = emb
        positions = np.broadcast_to(np.arange(T_pad, dtype=np.int32), (1, T_pad))
        bs = 4
        kc, vc = make_kv_cache(
            TCFG.num_hidden_layers, 8, bs, TCFG.num_key_value_heads,
            TCFG.actual_head_dim, jnp.float32,
        )
        table = [1, 2]
        slots = np.full((T_pad,), 0, np.int32)  # garbage for pads
        slots[:L] = prefill_slot_mapping(table, L, bs)
        logits, last_hidden, kc, vc = T.talker_prefill(
            talker_params, spec, jnp.asarray(embeds), jnp.asarray(positions),
            jnp.asarray([L], np.int32), jnp.asarray(slots), kc, vc,
        )
        p_np = ref_impl.to_np(talker_params)
        want_logits, want_hidden = ref_impl.talker_reference(
            p_np, spec, emb, np.arange(L)
        )
        np.testing.assert_allclose(
            np.asarray(last_hidden)[0], want_hidden[-1], rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(logits)[0], want_logits, rtol=2e-3, atol=2e-3
        )

    def test_decode_continues_prefill(self, talker_params, rng):
        """prefill(L) + paged decodes == numpy full forward with the
        reference position quirk (decode f uses position L+f)."""
        spec = T.talker_spec(TCFG)
        L, n_decode, bs = 5, 3, 4
        D = TCFG.hidden_size
        emb = rng.standard_normal((L, D)).astype(np.float32) * 0.5
        dec_embs = rng.standard_normal((n_decode, D)).astype(np.float32) * 0.5
        kc, vc = make_kv_cache(
            TCFG.num_hidden_layers, 8, bs, TCFG.num_key_value_heads,
            TCFG.actual_head_dim, jnp.float32,
        )
        table = [1, 2]
        T_pad = 8
        embeds = np.zeros((1, T_pad, D), np.float32)
        embeds[0, :L] = emb
        positions = np.broadcast_to(np.arange(T_pad, dtype=np.int32), (1, T_pad))
        slots = np.zeros((T_pad,), np.int32)
        slots[:L] = prefill_slot_mapping(table, L, bs)
        _, _, kc, vc = T.talker_prefill(
            talker_params, spec, jnp.asarray(embeds), jnp.asarray(positions),
            jnp.asarray([L], np.int32), jnp.asarray(slots), kc, vc,
        )
        got_logits = []
        kv_len = L
        for f in range(n_decode):
            slot = table[kv_len // bs] * bs + kv_len % bs
            logits, hidden, kc, vc = T.talker_decode(
                talker_params, spec,
                jnp.asarray(dec_embs[f][None]),
                jnp.asarray([kv_len + 1], np.int32),  # reference quirk
                jnp.asarray([slot], np.int32),
                jnp.asarray([table + [0]], np.int32),
                jnp.asarray([kv_len + 1], np.int32),
                kc, vc, bs,
            )
            kv_len += 1
            got_logits.append(np.asarray(logits)[0])
        # numpy: full forward over L+n tokens with positions 0..L-1, L+1..L+n
        p_np = ref_impl.to_np(talker_params)
        all_emb = np.concatenate([emb, dec_embs], axis=0)
        all_pos = np.concatenate([np.arange(L), L + 1 + np.arange(n_decode)])
        _, want_hidden = ref_impl.talker_reference(p_np, spec, all_emb, all_pos)
        for f in range(n_decode):
            want = want_hidden[L + f] @ p_np["codec_head_w"]
            np.testing.assert_allclose(
                got_logits[f], want, rtol=5e-3, atol=5e-3
            )


class TestPredictor:
    def test_frame_matches_numpy_argmax(self, pred_params, rng):
        spec = P.predictor_spec(PCFG)
        Dt = PCFG.talker_hidden_size
        hidden = rng.standard_normal((Dt,)).astype(np.float32) * 0.5
        cb0e = rng.standard_normal((Dt,)).astype(np.float32) * 0.5
        # top_k=1 + tiny temperature -> deterministic argmax sampling
        toks, emb_sum = P.predictor_frame(
            pred_params, spec,
            jnp.asarray(hidden[None]), jnp.asarray(cb0e[None]),
            jnp.asarray([1e-6], np.float32), jax.random.PRNGKey(7), top_k=1,
        )
        p_np = ref_impl.to_np(pred_params)
        want_toks, want_sum = ref_impl.predictor_reference_argmax(
            p_np, spec, hidden, cb0e
        )
        np.testing.assert_array_equal(np.asarray(toks)[0], want_toks)
        np.testing.assert_allclose(
            np.asarray(emb_sum)[0], want_sum, rtol=2e-3, atol=2e-3
        )

    def test_frame_batch_lanes_independent(self, pred_params, rng):
        """Batched lanes must equal independent single-lane runs."""
        spec = P.predictor_spec(PCFG)
        Dt = PCFG.talker_hidden_size
        h = rng.standard_normal((3, Dt)).astype(np.float32) * 0.5
        c = rng.standard_normal((3, Dt)).astype(np.float32) * 0.5
        temps = jnp.full((3,), 1e-6)
        toks_b, _ = P.predictor_frame(
            pred_params, spec, jnp.asarray(h), jnp.asarray(c), temps,
            jax.random.PRNGKey(3), top_k=1,
        )
        for b in range(3):
            toks_1, _ = P.predictor_frame(
                pred_params, spec, jnp.asarray(h[b][None]), jnp.asarray(c[b][None]),
                jnp.asarray([1e-6], np.float32), jax.random.PRNGKey(99), top_k=1,
            )
            np.testing.assert_array_equal(np.asarray(toks_b)[b], np.asarray(toks_1)[0])

    def test_sampling_respects_top_k(self, pred_params):
        """With top_k=50 and temp 0.9, tokens are valid vocab entries."""
        spec = P.predictor_spec(PCFG)
        Dt = PCFG.talker_hidden_size
        toks, _ = P.predictor_frame(
            pred_params, spec,
            jnp.zeros((2, Dt)), jnp.zeros((2, Dt)),
            jnp.full((2,), 0.9), jax.random.PRNGKey(0), top_k=50,
        )
        assert toks.shape == (2, 15)
        assert (np.asarray(toks) >= 0).all() and (np.asarray(toks) < PCFG.vocab_size).all()


def test_kv_write_garbage_slot_isolated():
    """Writes to the garbage block must not corrupt real slots."""
    kc = jnp.zeros((8, 2, 4))
    vc = jnp.zeros((8, 2, 4))
    k = jnp.ones((2, 2, 4))
    v = jnp.ones((2, 2, 4))
    kc2, vc2 = write_kv(kc, vc, k, v, jnp.asarray([0, 5]))
    assert np.asarray(kc2)[5].sum() == 8
    assert np.asarray(kc2)[1:5].sum() == 0


def test_unrolled_matches_scanned_decode(talker_params, rng):
    """spec.unroll=True must be numerically identical to the lax.scan path."""
    import dataclasses

    spec = T.talker_spec(TCFG)
    spec_u = dataclasses.replace(spec, unroll=True)
    bs = 4
    kc, vc = make_kv_cache(
        TCFG.num_hidden_layers, 8, bs, TCFG.num_key_value_heads,
        TCFG.actual_head_dim, jnp.float32,
    )
    D = TCFG.hidden_size
    # seed some KV history
    hist_k = rng.standard_normal(
        (TCFG.num_hidden_layers, 6, TCFG.num_key_value_heads, TCFG.actual_head_dim)
    ).astype(np.float32)
    hist_v = rng.standard_normal(hist_k.shape).astype(np.float32)
    kc = kc.at[:, 4:10].set(hist_k)
    vc = vc.at[:, 4:10].set(hist_v)
    emb = jnp.asarray(rng.standard_normal((1, D)).astype(np.float32) * 0.5)
    args = (
        jnp.asarray([7], np.int32), jnp.asarray([10], np.int32),
        jnp.asarray([[1, 2]], np.int32), jnp.asarray([7], np.int32),
    )
    l1, h1, _, _ = T.talker_decode(talker_params, spec, emb, *args, kc, vc, bs)
    l2, h2, _, _ = T.talker_decode(talker_params, spec_u, emb, *args, kc, vc, bs)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-5, atol=1e-5)


def test_fused_layer_stack_matches_unfused(talker_params, pred_params, rng):
    """fuse_layer_stack (qkv_w / gateup_w single matmuls) is numerically
    identical to the separate projections, bf16/f32, prefill + decode,
    with and without int8 quantization."""
    from nano_qwen3tts_tpu.models.transformer import fuse_layer_stack
    from nano_qwen3tts_tpu.ops.quant import quantize_layer_stack

    spec = T.talker_spec(TCFG)
    bs, L = 4, 7
    emb = rng.standard_normal((1, 8, TCFG.hidden_size)).astype(np.float32) * 0.5
    positions = np.broadcast_to(np.arange(8, dtype=np.int32), (1, 8))
    slots = np.arange(8, dtype=np.int32)

    def run(params):
        kc, vc = make_kv_cache(
            TCFG.num_hidden_layers, 8, bs, TCFG.num_key_value_heads,
            TCFG.actual_head_dim, jnp.float32,
        )
        return T.talker_prefill(
            params, spec, jnp.asarray(emb), jnp.asarray(positions),
            jnp.asarray([L], np.int32), jnp.asarray(slots), kc, vc,
        )[:2]

    fused = dict(talker_params, layers=fuse_layer_stack(talker_params["layers"]))
    assert "q_w" not in fused["layers"] and "qkv_w" in fused["layers"]
    for a, b in zip(run(talker_params), run(fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    # int8: quantize(fused) == fuse-then-quantize column-for-column, so the
    # quantized fused path must match the quantized unfused path exactly
    q_unfused = dict(
        talker_params, layers=quantize_layer_stack(talker_params["layers"])
    )
    q_fused = dict(fused, layers=quantize_layer_stack(fused["layers"]))
    for a, b in zip(run(q_unfused), run(q_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)

    # predictor stack fuses too (has its own layer geometry)
    pl = fuse_layer_stack(pred_params["layers"])
    assert "gateup_w" in pl and "gate_w" not in pl
