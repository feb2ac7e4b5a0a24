"""Tensor parallelism correctness: sharded == replicated on a CPU mesh.

The TP plan (parallel/sharding.py) is NamedSharding annotations; GSPMD must
produce numerically identical results to single-device execution. This pins
that for the fused decode step on the 8-device virtual mesh (2 data x 4
model — the talker's 2 KV heads force KV replication at model=4, exercising
the mixed replicate/shard rule).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_qwen3tts_tpu.config import EngineConfig, preset_config
from nano_qwen3tts_tpu.engine.fused_step import make_decode_step
from nano_qwen3tts_tpu.models.predictor import predictor_spec
from nano_qwen3tts_tpu.models.talker import talker_spec
from nano_qwen3tts_tpu.models.weights import init_predictor_params, init_talker_params
from nano_qwen3tts_tpu.ops.kv_cache import make_kv_cache
from nano_qwen3tts_tpu.parallel.mesh import mesh_for
from nano_qwen3tts_tpu.parallel.sharding import (
    apply_shardings,
    kv_cache_sharding,
    predictor_shardings,
    talker_shardings,
)

CFG = preset_config("tiny")
TC = CFG.talker_config
PC = TC.code_predictor_config


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_decode_step_matches_replicated(rng):
    tspec, pspec = talker_spec(TC), predictor_spec(PC)
    dtype = jnp.float32
    bs, NB, num_blocks = 16, 4, 16
    B, P, Lt, D = 4, 9, 32, TC.hidden_size

    tparams = init_talker_params(TC, jax.random.PRNGKey(0), dtype=dtype)
    tparams.pop("text_embedding")
    tparams.pop("text_projection")
    pparams = init_predictor_params(PC, jax.random.PRNGKey(1), dtype=dtype)
    kc, vc = make_kv_cache(
        TC.num_hidden_layers, num_blocks, bs, TC.num_key_value_heads,
        tspec.head_dim, dtype,
    )
    # seed KV history + pools with real data
    kc = kc.at[:, : 6 * bs].set(
        jnp.asarray(rng.standard_normal(kc[:, : 6 * bs].shape), dtype) * 0.3
    )
    vc = vc.at[:, : 6 * bs].set(
        jnp.asarray(rng.standard_normal(vc[:, : 6 * bs].shape), dtype) * 0.3
    )
    embed_pool = jnp.asarray(rng.standard_normal((P, D)), dtype) * 0.3
    trail_pool = jnp.asarray(rng.standard_normal((P, Lt, D)), dtype) * 0.3

    args = dict(
        pool_idx=jnp.arange(1, B + 1, dtype=jnp.int32),
        positions=jnp.full((B,), 20, jnp.int32),
        slots=jnp.arange(B, dtype=jnp.int32) * bs + 3,
        block_tables=jnp.tile(jnp.arange(1, NB + 1, dtype=jnp.int32), (B, 1)),
        kv_lens=jnp.full((B,), 20, jnp.int32),
        step_idx=jnp.zeros((B,), jnp.int32),
        temps_t=jnp.full((B,), 1e-6, jnp.float32),  # argmax: deterministic
        temps_p=jnp.full((B,), 1e-6, jnp.float32),
        key=jax.random.PRNGKey(7),
    )
    fn = make_decode_step(tspec, pspec, bs, Lt, dtype)

    # replicated single-device run
    _, _, pool_ref, frame_ref = jax.jit(fn)(
        tparams, pparams, kc, vc, embed_pool, trail_pool, *args.values()
    )

    # sharded run
    mesh = mesh_for(8)
    tsh = apply_shardings(tparams, talker_shardings(mesh, TC), mesh)
    psh = apply_shardings(pparams, predictor_shardings(mesh, PC), mesh)
    kv_sh = kv_cache_sharding(mesh, TC.num_key_value_heads)
    kc_s, vc_s = jax.device_put(kc, kv_sh), jax.device_put(vc, kv_sh)
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    repl = NamedSharding(mesh, Pspec())
    pool_s = jax.device_put(embed_pool, repl)
    trail_s = jax.device_put(trail_pool, repl)
    _, _, pool_out, frame_sh = jax.jit(fn)(
        tsh, psh, kc_s, vc_s, pool_s, trail_s, *args.values()
    )

    # argmax sampling -> identical tokens; embeds match to float tolerance
    np.testing.assert_array_equal(np.asarray(frame_ref), np.asarray(frame_sh))
    np.testing.assert_allclose(
        np.asarray(pool_ref), np.asarray(pool_out), rtol=2e-4, atol=2e-4
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_quantized_kv_sharding_places_int8_cache():
    """The flat int8 cache shards its value plane at head boundaries and
    replicates scales (predictor: 8 KV heads / model=4 -> shardable)."""
    from nano_qwen3tts_tpu.ops.kv_cache import make_kv_cache_int8
    from nano_qwen3tts_tpu.parallel.sharding import quantized_kv_sharding

    mesh = mesh_for(8)  # 2 data x 4 model
    kc, _ = make_kv_cache_int8(2, 4, 16, kv_heads=8, head_dim=32)
    sh = quantized_kv_sharding(mesh, 8)
    placed = jax.device_put(kc, sh)
    assert placed.q.sharding.spec == sh.q.spec
    assert placed.s.sharding.spec == sh.s.spec
    # talker regime: 2 KV heads at model=4 -> value plane replicated
    sh2 = quantized_kv_sharding(mesh, 2)
    from jax.sharding import PartitionSpec as P

    assert sh2.q.spec == P(None, None, None)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_data_sharded_decode_has_no_cross_host_collectives():
    """Multihost serving shape (examples/multihost_bench.py): per-data-shard
    KV/pool state under shard_map (manual "data", GSPMD-auto "model") must
    compile to a step whose collectives ALL stay inside the model axis —
    zero cross-host traffic, the scaling-efficiency proof (VERDICT r1 #9)."""
    from jax.sharding import NamedSharding

    from nano_qwen3tts_tpu.engine.fused_step import make_decode_multi_step
    from nano_qwen3tts_tpu.parallel.distributed import collective_span_report

    tspec, pspec = talker_spec(TC), predictor_spec(PC)
    mesh = mesh_for(8)  # 2 data x 4 model
    tp = init_talker_params(TC, jax.random.PRNGKey(0), dtype=jnp.float32)
    tp.pop("text_embedding")
    tp.pop("text_projection")
    pp = init_predictor_params(PC, jax.random.PRNGKey(1), dtype=jnp.float32)
    tp = apply_shardings(tp, talker_shardings(mesh, TC), mesh)
    pp = apply_shardings(pp, predictor_shardings(mesh, PC), mesh)

    n_data, Bh, bs, NB, Lt, D = 2, 4, 64, 2, 32, TC.hidden_size
    L, Hkv, hd = TC.num_hidden_layers, TC.num_key_value_heads, tspec.head_dim
    blocks_h = Bh * NB + 1
    dataN = lambda nd: NamedSharding(mesh, jax.sharding.PartitionSpec("data", *([None] * (nd - 1))))
    kc = jax.device_put(
        jnp.zeros((n_data, L, blocks_h * bs, Hkv, hd), jnp.float32), dataN(5)
    )
    vc = jax.device_put(jnp.zeros_like(kc), dataN(5))
    pool = jax.device_put(jnp.zeros((n_data, Bh + 1, D), jnp.float32), dataN(3))
    trail = jax.device_put(
        jnp.zeros((n_data, Bh + 1, Lt, D), jnp.float32), dataN(4)
    )
    meta = np.zeros((n_data, Bh, 3 + NB), np.int32)
    meta[:, :, 1] = 10
    meta_d = jax.device_put(jnp.asarray(meta), dataN(3))
    temps = jax.device_put(jnp.ones((n_data, 2, Bh), jnp.float32), dataN(3))
    keys = jax.device_put(
        jnp.stack([jax.random.PRNGKey(i) for i in range(n_data)]), dataN(2)
    )

    decode_local = make_decode_multi_step(tspec, pspec, bs, Lt, jnp.float32, 2)

    def sharded_step(tp_, pp_, kc_, vc_, pool_, trail_, meta_, temps_, key_):
        o = decode_local(
            tp_, pp_, kc_[0], vc_[0], pool_[0], trail_[0], meta_[0],
            temps_[0], key_[0],
        )
        return tuple(x[None] for x in o)

    d = jax.sharding.PartitionSpec("data")
    fn = jax.jit(
        jax.shard_map(
            sharded_step, mesh=mesh,
            in_specs=(jax.sharding.PartitionSpec(),) * 2 + (d,) * 7,
            out_specs=(d,) * 6, axis_names={"data"}, check_vma=False,
        ),
        donate_argnums=(2, 3, 4),
    )
    compiled = fn.lower(tp, pp, kc, vc, pool, trail, meta_d, temps, keys).compile()
    spans = collective_span_report(compiled.as_text(), mesh)
    assert spans["cross_data_axis"] == 0, spans
    assert spans["unknown"] == 0, spans
    assert spans["model_axis"] > 0  # TP psums exist and stay on ICI
    # and it actually runs
    out = fn(tp, pp, kc, vc, pool, trail, meta_d, temps, keys)
    assert out[5].shape == (n_data, 2, Bh, 16)
