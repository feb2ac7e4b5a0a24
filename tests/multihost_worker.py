"""Multi-host worker: one controller process of an N-process CPU "pod".

Run by tests/test_multihost.py as `python multihost_worker.py <port> <nproc>
<pid>`. Each process owns 4 virtual CPU devices; together they form a
(data=nproc, model=4) mesh where the model axis is host-local (ICI in a real
pod) and the data axis crosses processes (DCN). The FULL production serving
steps (fused prefill + multi-frame decode, engine/fused_step.py) run as ONE
logical program across processes — the multi-controller replacement for the
reference's ZMQ/SharedMemory worker plumbing (SURVEY §2.6, §2.9 N4/N5).

Verifies, per process:
  * mesh topology (model axis within host, data axis across hosts);
  * fused prefill + decode execute across processes;
  * frames match a process-local single-device reference run exactly
    (argmax sampling), i.e. GSPMD-over-DCN changes nothing numerically.
Prints "MULTIHOST_OK pid=<pid> frames=<checksum>" on success.
"""

import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(port: int, nproc: int, pid: int):
    import numpy as np

    from nano_qwen3tts_tpu.parallel.distributed import (
        global_array,
        global_tree,
        init_multihost,
        multihost_mesh,
        process_span_report,
    )

    active = init_multihost(f"127.0.0.1:{port}", nproc, pid)
    assert active and jax.process_count() == nproc
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nproc

    mesh = multihost_mesh()
    rep = process_span_report(mesh)
    assert rep["mesh_shape"] == {"data": nproc, "model": 4}, rep
    assert not rep["model_axis_crosses_hosts"], rep
    assert rep["data_axis_spans_hosts"], rep

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nano_qwen3tts_tpu.config import EngineConfig, preset_config
    from nano_qwen3tts_tpu.engine.fused_step import (
        make_decode_multi_step,
        make_prefill_step,
    )
    from nano_qwen3tts_tpu.models.predictor import predictor_spec
    from nano_qwen3tts_tpu.models.talker import talker_spec
    from nano_qwen3tts_tpu.models.weights import (
        init_predictor_params,
        init_talker_params,
    )
    from nano_qwen3tts_tpu.ops.kv_cache import make_kv_cache
    from nano_qwen3tts_tpu.parallel.sharding import (
        kv_cache_sharding,
        predictor_shardings,
        talker_shardings,
    )

    cfg = preset_config("tiny")
    tc = cfg.talker_config
    pc = tc.code_predictor_config
    ecfg = EngineConfig(max_model_len=256, kvcache_block_size=64, max_active_streams=8)
    tspec, pspec = talker_spec(tc), predictor_spec(pc)
    dtype = jnp.float32

    # identical seeded host-side values on every process
    tparams = init_talker_params(tc, jax.random.PRNGKey(0), dtype=dtype)
    tparams.pop("text_embedding")
    tparams.pop("text_projection")
    pparams = init_predictor_params(pc, jax.random.PRNGKey(1), dtype=dtype)

    bs, NB = ecfg.kvcache_block_size, ecfg.max_blocks_per_seq
    num_blocks, B, T = 16, 4, 64
    PP, Lt, D = 9, 64, tc.hidden_size
    kc0, vc0 = make_kv_cache(
        tc.num_hidden_layers, num_blocks, bs, tc.num_key_value_heads,
        tspec.head_dim, dtype,
    )
    pool0 = jnp.zeros((PP, D), dtype)
    trail0 = jnp.zeros((PP, Lt, D), dtype)
    L = T - 3
    meta = np.zeros((B, 3 + NB), np.int32)
    for i in range(B):
        meta[i, 0] = 1 + i
        meta[i, 1] = L
        meta[i, 3:] = [1 + i * NB + j for j in range(NB)]
    temps = np.full((2, B), 1e-6, np.float32)  # argmax: deterministic
    rngk = np.random.default_rng(5)
    embeds = rngk.standard_normal((B, T, D)).astype(np.float32) * 0.3
    meta_d = meta.copy()
    meta_d[:, 2] = 1

    prefill = jax.jit(make_prefill_step(tspec, pspec, Lt, dtype, bs))
    decode = jax.jit(make_decode_multi_step(tspec, pspec, bs, Lt, dtype, n_frames=4))

    def run(put):
        kc, vc, pool, frame0 = prefill(
            put(tparams, "talker"), put(pparams, "predictor"),
            put(kc0, "kv"), put(vc0, "kv"), put(pool0, "repl"),
            put(trail0, "repl"), put(embeds, "data"), put(meta, "data"),
            put(temps, "repl"), jnp.asarray(np.int32(0)),
        )
        _, _, pool, _, _, frames = decode(
            put(tparams, "talker"), put(pparams, "predictor"),
            kc, vc, pool, put(trail0, "repl"), put(meta_d, "data"),
            put(temps, "repl"), jax.random.PRNGKey(1),
        )
        return frame0, frames, pool

    # ---- process-local single-device reference ----------------------------
    dev0 = jax.local_devices()[0]

    def put_local(x, _rule):
        return jax.device_put(x, dev0)

    f0_ref, fr_ref, pool_ref = run(put_local)
    f0_ref, fr_ref = np.asarray(f0_ref), np.asarray(fr_ref)

    # ---- global cross-process run -----------------------------------------
    tsh = talker_shardings(mesh, tc)
    psh = predictor_shardings(mesh, pc)
    kv_sh = kv_cache_sharding(mesh, tc.num_key_value_heads)
    repl = NamedSharding(mesh, P())
    data_sh2 = {1: P("data"), 2: P("data", None), 3: P("data", None, None)}

    def put_global(x, rule):
        if rule == "talker":
            return global_tree(x, tsh, mesh)
        if rule == "predictor":
            return global_tree(x, psh, mesh)
        if rule == "kv":
            return global_array(x, kv_sh)
        if rule == "data":
            x = np.asarray(x)
            return global_array(x, NamedSharding(mesh, data_sh2[x.ndim]))
        return global_array(x, repl)

    f0_g, fr_g, pool_g = run(put_global)
    to_host = jax.jit(lambda x: x, out_shardings=repl)  # reshard -> replicated
    f0_g, fr_g = np.asarray(to_host(f0_g)), np.asarray(to_host(fr_g))
    pool_g, pool_ref = np.asarray(to_host(pool_g)), np.asarray(pool_ref)

    np.testing.assert_array_equal(f0_ref, f0_g)
    np.testing.assert_array_equal(fr_ref, fr_g)
    np.testing.assert_allclose(pool_ref, pool_g, rtol=2e-4, atol=2e-4)

    checksum = int(np.int64(fr_g.astype(np.int64).sum()) + f0_ref.sum())
    print(f"MULTIHOST_OK pid={pid} frames={checksum}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
