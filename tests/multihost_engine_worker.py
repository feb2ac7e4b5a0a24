"""Multi-controller worker: the PRODUCTION TTSEngine across OS processes.

Run by tests/test_multihost.py (VERDICT r3 next #3 — the reference serves
across processes as table stakes, workers/client_bridge.py:248-269; here
the multi-controller form is N identical engine processes executing the
same dispatch sequence over one global mesh whose "data" axis spans the
processes).

Modes:
  python multihost_engine_worker.py single <dp> <tp>
      one process, dp*tp virtual CPU devices — the control run.
  python multihost_engine_worker.py multi <port> <nproc> <pid> <dp> <tp>
      one of <nproc> controllers, each with dp*tp/nproc local devices.

Both modes build the same logical Mesh (devices sorted by
(process_index, id), reshaped [dp, tp]) and run the same request schedule
through the full production ``TTSEngine`` — data-sharded serving (per-shard
KV/pool state under manual-"data" shard_map), scheduler shard pinning,
least-loaded shard assignment. Near-argmax temperatures make sampled
frames integer-robust. Each process prints:

  ENGINE_FRAMES {"rid0": [[...16 ints...], ...], ...}

which the test compares bit-for-bit across the single-process control and
both controllers. The multi leg additionally asserts the data axis spans
the processes and (for dp>1) that the engine's own compiled decode program
has zero cross-data collectives — only the tiny frame fetch all-gather
crosses processes (runner._fetch_np).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def build_and_run(mesh, dp: int, tp: int, check_spans: bool):
    import jax
    import numpy as np

    from nano_qwen3tts_tpu.config import EngineConfig, preset_config
    from nano_qwen3tts_tpu.engine.engine import TTSEngine
    from nano_qwen3tts_tpu.models.weights import (
        init_predictor_params,
        init_talker_params,
    )

    cfg = preset_config("tiny")
    tc = cfg.talker_config
    ecfg = EngineConfig(
        max_model_len=256, kvcache_block_size=64, max_active_streams=8,
        decode_buckets=(1, 2, 4), prefill_buckets=(64,), frames_per_step=4,
        tensor_parallel_size=tp, data_parallel_size=dp,
    )
    tparams = init_talker_params(tc, jax.random.PRNGKey(0), dtype="float32")
    tparams.pop("text_embedding")
    tparams.pop("text_projection")
    pparams = init_predictor_params(
        tc.code_predictor_config, jax.random.PRNGKey(1), dtype="float32"
    )
    engine = TTSEngine(
        ecfg, cfg, tparams, pparams,
        tts_pad_embed=np.zeros(tc.hidden_size, np.float32),
        num_kvcache_blocks=32, mesh=mesh,
    )
    assert dict(engine.runner.mesh.shape) == {"data": dp, "model": tp}
    if dp > 1:
        assert engine.runner.data_sharded

    rng = np.random.default_rng(3)
    D = tc.hidden_size
    rids = []
    for i in range(4):
        rid = f"req{i}"
        engine.add_request(
            (rng.standard_normal((50 + i, D)) * 0.3).astype(np.float32),
            (rng.standard_normal((6, D)) * 0.3).astype(np.float32),
            request_id=rid,
            talker_temperature=1e-6,  # argmax: integer-robust across runs
            predictor_temperature=1e-6,
            max_frames=8,
            ignore_eos=True,
        )
        rids.append(rid)
    if dp > 1:
        # least-loaded shard assignment spread the 4 requests 2/2
        assert engine.runner._lanes_by_shard == [2] * dp, (
            engine.runner._lanes_by_shard
        )

    got = {r: [] for r in rids}
    steps = 0
    while engine.has_work():
        for rid, frame, _fin in engine.step():
            if isinstance(frame, list):
                got[rid].append(frame)
        steps += 1
        assert steps < 64, "engine did not drain"
    assert all(len(v) == 8 for v in got.values()), {
        k: len(v) for k, v in got.items()
    }

    if check_spans and dp > 1:
        from nano_qwen3tts_tpu.parallel.distributed import (
            collective_span_report,
            process_span_report,
        )

        rep = process_span_report(engine.runner.mesh)
        assert rep["data_axis_spans_hosts"], rep
        assert not rep["model_axis_crosses_hosts"], rep
        spans = collective_span_report(
            engine.runner.compiled_decode_text(bucket=2, n_frames=4),
            engine.runner.mesh,
        )
        assert spans["cross_data_axis"] == 0, spans
    return got


def main():
    mode = sys.argv[1]
    if mode == "single":
        dp, tp = int(sys.argv[2]), int(sys.argv[3])
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={dp * tp}"
        )
        os.environ["ENGINE_SEED"] = "7"
        import jax

        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from jax.sharding import Mesh

        devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        mesh = Mesh(np.asarray(devices).reshape(dp, tp), ("data", "model"))
        got = build_and_run(mesh, dp, tp, check_spans=False)
    else:
        port, nproc, pid = int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
        dp, tp = int(sys.argv[5]), int(sys.argv[6])
        assert (dp * tp) % nproc == 0
        os.environ["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={dp * tp // nproc}"
        )
        os.environ["ENGINE_SEED"] = "7"
        import jax

        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from jax.sharding import Mesh

        from nano_qwen3tts_tpu.parallel.distributed import init_multihost

        active = init_multihost(f"127.0.0.1:{port}", nproc, pid)
        assert active and jax.process_count() == nproc
        devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        mesh = Mesh(np.asarray(devices).reshape(dp, tp), ("data", "model"))
        got = build_and_run(mesh, dp, tp, check_spans=True)
    print("ENGINE_FRAMES " + json.dumps(got, sort_keys=True), flush=True)


if __name__ == "__main__":
    main()
