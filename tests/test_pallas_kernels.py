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
