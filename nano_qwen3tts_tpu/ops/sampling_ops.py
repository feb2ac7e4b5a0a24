"""On-device sampling: temperature -> top-k(50) -> categorical.

Parity with the reference Sampler (layers/sampler.py:14-24): logits are cast
to f32, divided by per-sequence temperature, masked to the top-k, and
sampled; top_p is declared but not applied, exactly as in the reference.
Runs inside the fused frame step so sampled tokens never bounce through the
host between talker and predictor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def sample_top_k(
    logits: jax.Array,  # [B, V]
    temperatures: jax.Array,  # [B] f32
    key: jax.Array,  # PRNG key
    top_k: int = 50,
) -> jax.Array:
    """Returns sampled token ids [B] (int32)."""
    logits = logits.astype(jnp.float32) / temperatures[:, None]
    kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    masked = jnp.where(logits < kth, NEG_INF, logits)
    return jax.random.categorical(key, masked, axis=-1).astype(jnp.int32)
