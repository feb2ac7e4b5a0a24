"""Pallas kernels vs XLA reference (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nano_qwen3tts_tpu.ops.attention import paged_decode_attention_xla
from nano_qwen3tts_tpu.ops.paged_attention_pallas import (
    paged_decode_attention_pallas,
)


@pytest.mark.parametrize("Hq,Hkv,d", [(8, 2, 64), (4, 4, 32)])
def test_paged_decode_pallas_matches_xla(rng, Hq, Hkv, d):
    B, bs, NB = 3, 16, 4
    S = 32 * bs
    q = rng.standard_normal((B, Hq, d)).astype(np.float32)
    kc = rng.standard_normal((S, Hkv, d)).astype(np.float32)
    vc = rng.standard_normal((S, Hkv, d)).astype(np.float32)
    tables = np.array([[5, 9, 2, 0], [7, 1, 0, 0], [3, 4, 6, 8]], np.int32)
    kv_lens = np.array([40, 17, 64], np.int32)
    scale = d**-0.5
    want = np.asarray(
        paged_decode_attention_xla(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(tables), jnp.asarray(kv_lens), bs, scale,
        )
    )
    got = np.asarray(
        paged_decode_attention_pallas(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(tables), jnp.asarray(kv_lens), bs, scale,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_paged_decode_pallas_single_lane(rng):
    B, Hq, Hkv, d, bs, NB = 1, 16, 2, 128, 128, 2
    S = 8 * bs
    q = rng.standard_normal((B, Hq, d)).astype(np.float32)
    kc = rng.standard_normal((S, Hkv, d)).astype(np.float32)
    vc = rng.standard_normal((S, Hkv, d)).astype(np.float32)
    tables = np.array([[3, 5]], np.int32)
    kv_lens = np.array([200], np.int32)
    scale = d**-0.5
    want = np.asarray(
        paged_decode_attention_xla(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(tables), jnp.asarray(kv_lens), bs, scale,
        )
    )
    got = np.asarray(
        paged_decode_attention_pallas(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(tables), jnp.asarray(kv_lens), bs, scale,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestInt8Quant:
    def test_quantized_linear_close_to_f32(self, rng):
        import jax.numpy as jnp

        from nano_qwen3tts_tpu.ops.quant import (
            int8_linear_w8a8,
            int8_linear_w8a16,
            quantize_weight,
        )

        x = rng.standard_normal((8, 256)).astype(np.float32)
        w = (rng.standard_normal((256, 512)) * 0.05).astype(np.float32)
        want = x @ w
        for mode, fn in (("w8a16", int8_linear_w8a16), ("w8a8", int8_linear_w8a8)):
            wq = quantize_weight(jnp.asarray(w), mode)
            got = np.asarray(fn(jnp.asarray(x), wq))
            rel = np.abs(got - want).mean() / np.abs(want).mean()
            assert rel < 0.02, (mode, rel)

    def test_quantized_engine_end_to_end(self, rng):
        import jax
        import jax.numpy as jnp

        from nano_qwen3tts_tpu.config import EngineConfig, preset_config
        from nano_qwen3tts_tpu.engine.engine import TTSEngine
        from nano_qwen3tts_tpu.models.weights import (
            init_predictor_params,
            init_talker_params,
        )

        cfg = preset_config("tiny")
        tc = cfg.talker_config
        tp = init_talker_params(tc, jax.random.PRNGKey(0), dtype=jnp.float32)
        pp = init_predictor_params(
            tc.code_predictor_config, jax.random.PRNGKey(1), dtype=jnp.float32
        )
        ecfg = EngineConfig(
            max_model_len=64, kvcache_block_size=16, max_num_batched_tokens=1024,
            max_active_streams=4, decode_buckets=(1, 2), prefill_buckets=(32, 64),
            quantization="int8", frames_per_step=2,
        )
        eng = TTSEngine(ecfg, cfg, tp, pp,
                        tts_pad_embed=np.zeros(tc.hidden_size, np.float32),
                        num_kvcache_blocks=32)
        prompt = (rng.standard_normal((10, tc.hidden_size)) * 0.3).astype(np.float32)
        frames = list(eng.generate(prompt, None, max_frames=4))
        assert 1 <= len(frames) <= 4
        assert all(len(f) == 16 for f in frames)

    def test_fp8_linear_close_to_f32(self, rng):
        """fp8 (e4m3 weight-only) quantization: same surface as int8, looser
        rounding (3 mantissa bits) but still close on well-scaled weights."""
        import jax.numpy as jnp

        from nano_qwen3tts_tpu.ops.quant import quantize_weight, quantized_linear

        x = rng.standard_normal((8, 256)).astype(np.float32)
        w = (rng.standard_normal((256, 512)) * 0.05).astype(np.float32)
        want = x @ w
        wq = quantize_weight(jnp.asarray(w), "fp8")
        assert wq.q.dtype == jnp.float8_e4m3fn
        got = np.asarray(quantized_linear(jnp.asarray(x), wq))
        rel = np.abs(got - want).mean() / np.abs(want).mean()
        assert rel < 0.05, rel

    def test_fp8_engine_end_to_end(self, rng):
        """quantization='fp8' serves frames (north-star: INT8/FP8 weights)."""
        import jax
        import jax.numpy as jnp

        from nano_qwen3tts_tpu.config import EngineConfig, preset_config
        from nano_qwen3tts_tpu.engine.engine import TTSEngine
        from nano_qwen3tts_tpu.models.weights import (
            init_predictor_params,
            init_talker_params,
        )

        cfg = preset_config("tiny")
        tc = cfg.talker_config
        tp = init_talker_params(tc, jax.random.PRNGKey(0), dtype=jnp.float32)
        pp = init_predictor_params(
            tc.code_predictor_config, jax.random.PRNGKey(1), dtype=jnp.float32
        )
        ecfg = EngineConfig(
            max_model_len=64, kvcache_block_size=16, max_num_batched_tokens=1024,
            max_active_streams=4, decode_buckets=(1, 2), prefill_buckets=(32, 64),
            quantization="fp8", kv_cache_dtype="int8", frames_per_step=2,
        )
        eng = TTSEngine(ecfg, cfg, tp, pp,
                        tts_pad_embed=np.zeros(tc.hidden_size, np.float32),
                        num_kvcache_blocks=32)
        from nano_qwen3tts_tpu.ops.quant import QuantizedWeight

        gu = eng.runner.tparams["layers"]["gateup_w"]
        assert isinstance(gu, QuantizedWeight) and gu.mode == "fp8"
        import jax.numpy as _jnp

        assert gu.q.dtype == _jnp.float8_e4m3fn
        prompt = (rng.standard_normal((10, tc.hidden_size)) * 0.3).astype(np.float32)
        frames = list(eng.generate(prompt, None, max_frames=4))
        assert 1 <= len(frames) <= 4
        assert all(len(f) == 16 for f in frames)


def test_extend_attention_pallas_matches_xla(rng):
    """Attend-with-extension kernel == XLA fallback (interpret mode)."""
    import jax.numpy as jnp

    from nano_qwen3tts_tpu.ops.paged_attention_pallas import (
        paged_decode_attention_extend,
        paged_decode_attention_extend_xla,
    )

    B, Hq, Hkv, d, bs, NB, L = 3, 8, 2, 64, 16, 4, 2
    S = 32 * bs
    q = rng.standard_normal((B, Hq, d)).astype(np.float32)
    kn = rng.standard_normal((B, Hkv, d)).astype(np.float32)
    vn = rng.standard_normal((B, Hkv, d)).astype(np.float32)
    kc = rng.standard_normal((L, S, Hkv, d)).astype(np.float32)
    vc = rng.standard_normal((L, S, Hkv, d)).astype(np.float32)
    tables = np.array([[5, 9, 2, 0], [7, 1, 0, 0], [3, 4, 6, 8]], np.int32)
    lens = np.array([40, 17, 63], np.int32)  # existing entries
    layer = jnp.asarray(1, jnp.int32)
    args = (
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(kc), jnp.asarray(vc), layer,
        jnp.asarray(tables), jnp.asarray(lens), bs, d**-0.5,
    )
    want = np.asarray(paged_decode_attention_extend_xla(*args))
    got = np.asarray(paged_decode_attention_extend(*args, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestInt8KV:
    def test_extend_int8_xla_close_to_bf16(self, rng):
        """int8-KV attention ~= full-precision attention (quantization noise)."""
        import jax.numpy as jnp

        from nano_qwen3tts_tpu.ops.kv_cache import QuantizedKV, quantize_kv_rows
        from nano_qwen3tts_tpu.ops.paged_attention_pallas import (
            paged_decode_attention_extend_int8_xla,
            paged_decode_attention_extend_xla,
        )

        B, Hq, Hkv, d, bs, NB, L = 2, 8, 2, 64, 16, 4, 2
        S = 32 * bs
        q = rng.standard_normal((B, Hq, d)).astype(np.float32)
        kn = rng.standard_normal((B, Hkv, d)).astype(np.float32)
        vn = rng.standard_normal((B, Hkv, d)).astype(np.float32)
        kc = rng.standard_normal((L, S, Hkv, d)).astype(np.float32)
        vc = rng.standard_normal((L, S, Hkv, d)).astype(np.float32)
        kq, ks = quantize_kv_rows(jnp.asarray(kc))
        vq, vs = quantize_kv_rows(jnp.asarray(vc))
        # QuantizedKV stores the value plane flat (see ops/kv_cache.py)
        kqkv = QuantizedKV(kq.reshape(L, S, -1), ks)
        vqkv = QuantizedKV(vq.reshape(L, S, -1), vs)
        tables = np.array([[5, 9, 2, 0], [7, 1, 0, 0]], np.int32)
        lens = np.array([40, 17], np.int32)
        layer = jnp.asarray(1, jnp.int32)
        args = (jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn))
        tail = (layer, jnp.asarray(tables), jnp.asarray(lens), bs, d**-0.5)
        want = np.asarray(
            paged_decode_attention_extend_xla(
                *args, jnp.asarray(kc), jnp.asarray(vc), *tail
            )
        )
        got = np.asarray(
            paged_decode_attention_extend_int8_xla(*args, kqkv, vqkv, *tail)
        )
        rel = np.abs(got - want).mean() / np.abs(want).mean()
        assert rel < 0.02, rel

    def test_extend_int8_pallas_matches_xla(self, rng):
        import jax.numpy as jnp

        from nano_qwen3tts_tpu.ops.kv_cache import QuantizedKV, quantize_kv_rows
        from nano_qwen3tts_tpu.ops.paged_attention_pallas import (
            paged_decode_attention_extend_int8,
            paged_decode_attention_extend_int8_xla,
        )

        B, Hq, Hkv, d, bs, NB, L = 2, 8, 2, 64, 16, 4, 2
        S = 32 * bs
        q = rng.standard_normal((B, Hq, d)).astype(np.float32)
        kn = rng.standard_normal((B, Hkv, d)).astype(np.float32)
        vn = rng.standard_normal((B, Hkv, d)).astype(np.float32)
        kc = rng.standard_normal((L, S, Hkv, d)).astype(np.float32)
        vc = rng.standard_normal((L, S, Hkv, d)).astype(np.float32)
        kq, ks = quantize_kv_rows(jnp.asarray(kc))
        vq, vs = quantize_kv_rows(jnp.asarray(vc))
        # QuantizedKV stores the value plane flat (see ops/kv_cache.py)
        kqkv = QuantizedKV(kq.reshape(L, S, -1), ks)
        vqkv = QuantizedKV(vq.reshape(L, S, -1), vs)
        tables = np.array([[5, 9, 2, 0], [7, 1, 0, 0]], np.int32)
        lens = np.array([40, 17], np.int32)
        layer = jnp.asarray(0, jnp.int32)
        args = (jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn), kqkv, vqkv,
                layer, jnp.asarray(tables), jnp.asarray(lens), bs, d**-0.5)
        want = np.asarray(paged_decode_attention_extend_int8_xla(*args))
        got = np.asarray(
            paged_decode_attention_extend_int8(*args, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)

    def test_engine_end_to_end_int8_kv(self, rng):
        import jax
        import jax.numpy as jnp

        from nano_qwen3tts_tpu.config import EngineConfig, preset_config
        from nano_qwen3tts_tpu.engine.engine import TTSEngine
        from nano_qwen3tts_tpu.models.weights import (
            init_predictor_params,
            init_talker_params,
        )

        cfg = preset_config("tiny")
        tc = cfg.talker_config
        tp = init_talker_params(tc, jax.random.PRNGKey(0), dtype=jnp.float32)
        pp = init_predictor_params(
            tc.code_predictor_config, jax.random.PRNGKey(1), dtype=jnp.float32
        )
        ecfg = EngineConfig(
            max_model_len=64, kvcache_block_size=16, max_num_batched_tokens=1024,
            max_active_streams=4, decode_buckets=(1, 2), prefill_buckets=(32, 64),
            kv_cache_dtype="int8", frames_per_step=2,
        )
        eng = TTSEngine(ecfg, cfg, tp, pp,
                        tts_pad_embed=np.zeros(tc.hidden_size, np.float32),
                        num_kvcache_blocks=32)
        prompt = (rng.standard_normal((10, tc.hidden_size)) * 0.3).astype(np.float32)
        frames = list(eng.generate(prompt, None, max_frames=5))
        assert 1 <= len(frames) <= 5
        assert all(len(f) == 16 for f in frames)


def test_talker_burst_batched_attn_matches_loop(rng, monkeypatch):
    """The two attention formulations inside the whole-stack talker burst
    kernel — the per-lane loop (small B) and the batched flat-domain form
    (B >= 16; one pad-free scores/accumulate dot_general chain per KV
    group) — are BIT-identical through all layers, cache rows included
    (interpret mode; the TPU timing ablation lives in tools/burst_profile
    + PARITY.md)."""
    import jax
    import jax.numpy as jnp

    import nano_qwen3tts_tpu.ops.talker_burst_pallas as tb
    from nano_qwen3tts_tpu.config import preset_config
    from nano_qwen3tts_tpu.models.talker import talker_spec
    from nano_qwen3tts_tpu.models.transformer import fuse_layer_stack
    from nano_qwen3tts_tpu.models.weights import init_talker_params
    from nano_qwen3tts_tpu.ops.kv_cache import QuantizedKV, make_kv_cache_int8
    from nano_qwen3tts_tpu.ops.quant import quantize_talker_params

    cfg = preset_config("tiny")
    tc = cfg.talker_config
    spec = talker_spec(tc)
    tp = init_talker_params(
        tc, jax.random.PRNGKey(0), dtype=jnp.bfloat16, include_text=False
    )
    tp = dict(tp, layers=fuse_layer_stack(tp["layers"]))
    tp = quantize_talker_params(tp, "w8a8")
    bp = tb.make_burst_params(tp, spec)
    assert bp is not None
    tp = dict(tp, talker_burst=bp)
    bs, B = 64, 16
    kc, vc = make_kv_cache_int8(
        tc.num_hidden_layers, B + 1, bs, tc.num_key_value_heads, spec.head_dim
    )
    x = jnp.asarray(
        rng.standard_normal((B, tc.hidden_size)) * 0.3, jnp.bfloat16
    )
    pos = jnp.full((B,), 20, jnp.int32)
    tables = jnp.arange(1, B + 1, dtype=jnp.int32).reshape(B, 1)
    kv_lens = jnp.full((B,), 20, jnp.int32)
    kq0 = jnp.asarray(rng.integers(-80, 80, kc.q.shape), jnp.int8)
    ks0 = jnp.asarray(rng.random(kc.s.shape) * 0.01 + 0.005, jnp.float32)
    vq0 = jnp.asarray(rng.integers(-80, 80, vc.q.shape), jnp.int8)
    vs0 = jnp.asarray(rng.random(vc.s.shape) * 0.01 + 0.005, jnp.float32)

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("NANO_TTS_BURST_BATCHED_ATTN", mode)
        hid, kq, vq = tb.talker_stack_burst(
            tp, spec, x, pos, tables, kv_lens,
            QuantizedKV(kq0, ks0), QuantizedKV(vq0, vs0), bs, interpret=True,
        )
        outs[mode] = (
            np.asarray(hid, np.float32), np.asarray(kq.q), np.asarray(kq.s),
            np.asarray(vq.q), np.asarray(vq.s),
        )
    for a, b in zip(outs["0"], outs["1"]):
        np.testing.assert_array_equal(a, b)
