"""Probe: is int4 predictor weight storage worth it on this TPU stack?

VERDICT r1 #6 asked for an int4/w4a8 predictor prototype — the predictor
burst kernel's floor is the 16 sequential M=B matmul passes streaming each
layer's int8 weights (ops/predictor_burst_pallas.py). This probe answers
whether 4-bit weights can lower that floor. Findings on v5e (jax 0.9.0,
2026-08-20):

* The M=8 weight-stationary matmul is bound by weight ELEMENT throughput
  into the MXU, not bytes: a [1024,3072] int8 dot at M=8 costs the same
  order as bf16 (41.5 us XLA int8 / 16.9 us Pallas int8 / 17.3 us bf16) —
  and the burst kernel's weights are already VMEM-resident, so halving
  HBM bytes does not touch the floor.
* Native sub-byte types are unusable in this stack: any `astype(jnp.int4)`
  (XLA S4, in or out of Pallas) fails with a RecursionError inside jit
  dispatch — there is no int4 MXU path to reach.
* Manual nibble packing (two int4 per int8) would halve VMEM reads but
  pays an unpack (shift/mask/widen) over every weight element per grid
  step on the VPU — at 15.7 MB/layer/step that costs more than the matmul
  it feeds.

Conclusion (recorded in PARITY.md): the single-chip predictor lever is
batch amortization (the weight stream is batch-independent), not a
smaller weight format. See tools/wdtype_ablation.py for the measured
batch x weight-format table.

Run: python tools/int4_probe.py  (uses the default JAX device)
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K, N = 1024, 3072  # predictor gate/up shape (config.CodePredictorConfig)
REPS = 200


def timeit(f, *args):
    jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(REPS):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / REPS * 1e6  # us


def main():
    key = jax.random.PRNGKey(0)
    w8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    wb = jax.random.normal(key, (K, N), jnp.bfloat16)

    dot8 = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    )
    dotb = jax.jit(
        lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    )

    for m in (8, 32, 128, 256):
        x8 = jax.random.randint(key, (m, K), -127, 127, jnp.int8)
        xb = jax.random.normal(key, (m, K), jnp.bfloat16)
        print(f"XLA  dot M={m:3d}: bf16 {timeit(dotb, xb, wb):6.1f} us   "
              f"int8 {timeit(dot8, x8, w8):6.1f} us")

    def k8(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    x8 = jax.random.randint(key, (8, K), -127, 127, jnp.int8)
    f8 = jax.jit(
        pl.pallas_call(
            k8, out_shape=jax.ShapeDtypeStruct((8, N), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
    )
    print(f"Pallas int8 dot M=8: {timeit(f8, x8, w8):6.1f} us")

    try:
        w4 = w8.astype(jnp.int4)
        print(f"XLA int8 x int4 dot M=8: {timeit(dot8, x8, w4):6.1f} us")
    except Exception as e:
        print(f"int4 (XLA S4) unusable: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
