"""Multi-host scaling benchmark (SURVEY §7 step 8 / BASELINE.json config #5).

Measures decode-frame throughput of the fused serving step over an
N-process device mesh and reports scaling efficiency vs. a single host.
The data axis spans hosts (each host serves its own batch shard — the
deployment shape for >1 host TTS serving), the model axis stays host-local.

On a real TPU pod, launch one copy per host (the pod runtime auto-detects
coordinator/world; or set JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID) with no --spawn flag:

    python multihost_bench.py --batch-per-host 8

Without a pod, `--spawn N` forks N local controller processes over virtual
CPU devices to demonstrate/validate the machinery (CPU times are not TPU
times; the point is the cross-process program and the efficiency math).

Reference comparison: the reference scales by running independent server
processes per GPU (SURVEY §2.10 DP row) — per-host efficiency 100% by
construction but with no shared prefix cache or cross-host batching; here
one logical engine spans hosts and efficiency = throughput_N / (N *
throughput_1).
"""

import argparse
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def run_bench(batch_per_host: int, devices_per_host: int, steps: int):
    import jax

    from nano_qwen3tts_tpu.parallel.distributed import (
        global_array,
        global_tree,
        init_multihost,
        is_primary,
        multihost_mesh,
        process_span_report,
    )

    init_multihost()
    nproc = jax.process_count()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nano_qwen3tts_tpu.config import EngineConfig, preset_config
    from nano_qwen3tts_tpu.engine.fused_step import make_decode_multi_step
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

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = preset_config("1.7b" if on_tpu else "tiny")
    tc = cfg.talker_config
    pc = tc.code_predictor_config
    ecfg = EngineConfig(
        max_model_len=1024 if on_tpu else 256,
        kvcache_block_size=128 if on_tpu else 64,
    )
    tspec, pspec = talker_spec(tc), predictor_spec(pc)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    mesh = multihost_mesh(model_per_host=devices_per_host)
    rep = process_span_report(mesh)
    if is_primary():
        print(f"[mh-bench] {rep}", flush=True)

    tparams = init_talker_params(tc, jax.random.PRNGKey(0), dtype=dtype)
    tparams.pop("text_embedding")
    tparams.pop("text_projection")
    pparams = init_predictor_params(pc, jax.random.PRNGKey(1), dtype=dtype)
    tparams = global_tree(tparams, talker_shardings(mesh, tc), mesh)
    pparams = global_tree(pparams, predictor_shardings(mesh, pc), mesh)

    B = batch_per_host * nproc
    bs, NB = ecfg.kvcache_block_size, ecfg.max_blocks_per_seq
    num_blocks = B * NB + 1
    PP, Lt, D = B + 1, 64, tc.hidden_size
    kv_sh = kv_cache_sharding(mesh, tc.num_key_value_heads)
    repl = NamedSharding(mesh, P())
    data1 = NamedSharding(mesh, P("data"))
    data2 = NamedSharding(mesh, P("data", None))

    kc, vc = make_kv_cache(
        tc.num_hidden_layers, num_blocks, bs, tc.num_key_value_heads,
        tspec.head_dim, dtype,
    )
    kc, vc = global_array(kc, kv_sh), global_array(vc, kv_sh)
    pool = global_array(np.zeros((PP, D), np.float32).astype(dtype), repl)
    trail = global_array(np.zeros((PP, Lt, D), np.float32).astype(dtype), repl)
    meta = np.zeros((B, 3 + NB), np.int32)
    for i in range(B):
        meta[i, 0] = 1 + i
        meta[i, 1] = 20
        meta[i, 2] = 1
        meta[i, 3:] = [1 + i * NB + j for j in range(NB)]
    meta = global_array(meta, data2)
    temps = global_array(np.ones((2, B), np.float32), repl)

    n_frames = 4
    decode = jax.jit(
        make_decode_multi_step(tspec, pspec, bs, Lt, dtype, n_frames=n_frames),
        donate_argnums=(2, 3, 4),
    )
    key = jax.random.PRNGKey(0)

    # warmup/compile
    kc, vc, pool, meta, key, frames = decode(
        tparams, pparams, kc, vc, pool, trail, meta, temps, key
    )
    frames.block_until_ready()

    times = []
    for _ in range(steps):
        t0 = time.perf_counter()
        kc, vc, pool, meta, key, frames = decode(
            tparams, pparams, kc, vc, pool, trail, meta, temps, key
        )
        frames.block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times)) / n_frames
    fps = B / dt  # frames/s across the whole mesh
    if is_primary():
        print(
            f"[mh-bench] procs={nproc} B={B} ({batch_per_host}/host): "
            f"{dt*1e3:.2f} ms/frame-step, {fps:.1f} frames/s total, "
            f"{fps/nproc:.1f} frames/s/host",
            flush=True,
        )
    return fps


def spawn_mode(n: int, args):
    """Fork N local controller processes on virtual CPU devices, then a
    1-process run, and report scaling efficiency."""
    script = os.path.abspath(__file__)
    env_base = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}

    def launch(nproc):
        port = free_port()
        procs = []
        for pid in range(nproc):
            env = dict(
                env_base,
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES=str(nproc),
                JAX_PROCESS_ID=str(pid),
                MH_BENCH_CHILD="1",
                XLA_FLAGS=f"--xla_force_host_platform_device_count={args.devices_per_host}",
            )
            procs.append(
                subprocess.Popen(
                    [sys.executable, script, "--batch-per-host",
                     str(args.batch_per_host), "--steps", str(args.steps),
                     "--devices-per-host", str(args.devices_per_host)],
                    env=env, stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT, text=True,
                )
            )
        outs = [p.communicate()[0] for p in procs]
        assert all(p.returncode == 0 for p in procs), outs[0][-3000:]
        for line in outs[0].splitlines():
            if "frames/s total" in line:
                print(line)
                return float(line.split(": ")[1].split("ms/frame-step, ")[1].split(" frames/s")[0])
        raise RuntimeError(outs[0][-3000:])

    print(f"== 1 host ==")
    f1 = launch(1)
    print(f"== {n} hosts ==")
    fn = launch(n)
    eff = fn / (n * f1)
    print(f"[mh-bench] scaling efficiency {n} hosts: {eff*100:.1f}% "
          f"({fn:.1f} vs {n}x{f1:.1f} frames/s)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spawn", type=int, default=0,
                    help="fork N local CPU controller processes (demo mode)")
    ap.add_argument("--batch-per-host", type=int, default=8)
    ap.add_argument("--devices-per-host", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    if args.spawn and not os.environ.get("MH_BENCH_CHILD"):
        spawn_mode(args.spawn, args)
        return

    if os.environ.get("MH_BENCH_CHILD"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    run_bench(args.batch_per_host, args.devices_per_host, args.steps)


if __name__ == "__main__":
    main()
