"""Code predictor: expands one talker frame into codebooks 1..15.

Pure-function equivalent of the reference Qwen3TTSCodePredictorForCausalLM
(models/qwen3_tts_predictor.py:17-124) — but the whole 17-token lifetime
(2-token prefill + 15 decode steps) is ONE jitted function with a
``lax.scan`` over codebook steps. The reference runs this as 17 Python-level
engine ``step()`` calls through a separate worker process with per-step CUDA
graphs (predictor_worker.py:125-144, predictor_model_runner.py:159-264);
here it is a single XLA program with no host round-trips.

Semantics reproduced exactly:
* prefill input = [talker_last_hidden, talker_codec_embed(cb0)] at talker
  hidden dim, positions 0..1 (interface.py:1243-1252);
* ``small_to_mtp_projection`` applied to *all* input embeddings when
  predictor hidden != talker hidden (qwen3_tts_predictor.py:58-61,106);
* decode step g embeds the previous token with per-codebook table
  ``codec_embedding[g-1]`` and samples with per-codebook head
  ``lm_head[g]`` (qwen3_tts_predictor.py:87-99,110-124); the prefill
  samples codebook 1 from ``lm_head[0]``;
* decode positions are 2..16 (standard last-token positions,
  engine/model_runner/base.py:218-227);
* sampling: temperature 0.9, top-k 50 (interface.py:1196, sampler.py:14-24).

Also computes the summed predictor-codebook embedding needed for the next
talker input (interface.py:1276-1281) on device, so the frame loop never
materializes per-codebook embeddings on the host.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from nano_qwen3tts_tpu.models.transformer import (
    AttnSpec,
    linear,
    stack_decode_dense_cache,
    stack_prefill_dense_cache,
)
from nano_qwen3tts_tpu.ops.sampling_ops import sample_top_k

NUM_STEPS = 15  # codebooks 1..15
KV_WINDOW = 17  # 2 prefill + 15 decode positions


def predictor_spec(cfg) -> AttnSpec:
    return AttnSpec.from_model_config(cfg)


def _index_head(lm_heads, i):
    """Select per-codebook LM head i from the stacked (possibly quantized)
    tensor; i may be traced (dynamic_index inside the scan)."""
    if not isinstance(lm_heads, jax.Array):
        return lm_heads.index(i)  # QuantizedWeight
    return jax.lax.dynamic_index_in_dim(lm_heads, i, axis=0, keepdims=False)


def _maybe_project(params: dict, x: jax.Array) -> jax.Array:
    if "proj_w" in params:
        return linear(x, params["proj_w"], params["proj_b"])
    return x


def predictor_frame(
    params: dict,
    spec: AttnSpec,
    talker_hidden: jax.Array,  # [B, Dt] talker post-norm last hidden
    cb0_embed: jax.Array,  # [B, Dt] talker codec_embedding(cb0)
    temperatures: jax.Array,  # [B] f32 (0.9 in the reference)
    key: jax.Array,
    top_k: int = 50,
):
    """Run one full frame expansion.

    Returns (tokens [B, 15] int32, pred_emb_sum [B, Dt]) where pred_emb_sum
    is sum_i codec_embeddings[i][tokens[:, i]] — the predictor part of the
    next talker input embedding.
    """
    B, Dt = talker_hidden.shape
    L = params["norm"].shape[-1]  # predictor hidden size
    num_layers = params["layers"]["input_layernorm"].shape[0]
    dtype = params["norm"].dtype

    # -- prefill (2 tokens) -------------------------------------------------
    x = jnp.stack([talker_hidden, cb0_embed], axis=1).astype(dtype)  # [B,2,Dt]
    x = _maybe_project(params, x)
    positions = jnp.broadcast_to(
        jnp.arange(2, dtype=jnp.int32)[None, :], (B, 2)
    )
    k_ctx = jnp.zeros(
        (num_layers, B, KV_WINDOW, spec.num_kv_heads, spec.head_dim), dtype
    )
    v_ctx = jnp.zeros_like(k_ctx)
    hidden, k_ctx, v_ctx = stack_prefill_dense_cache(
        params["layers"], params["norm"], x, positions, k_ctx, v_ctx, spec
    )
    last_hidden = hidden[:, -1]  # [B, Dp]
    logits = linear(last_hidden, _index_head(params["lm_heads"], 0))
    key, sub = jax.random.split(key)
    tok1 = sample_top_k(logits, temperatures, sub, top_k)  # codebook 1

    # -- decode scan (codebooks 2..15) --------------------------------------
    def step(carry, i):
        k_ctx, v_ctx, prev_tok, emb_sum, key = carry
        # Embed prev token with table i-1 (talker-dim), project, decode.
        table = jax.lax.dynamic_index_in_dim(
            params["codec_embeddings"], i - 1, axis=0, keepdims=False
        )  # [V, Dt]
        emb_t = table[prev_tok]  # [B, Dt]
        emb_sum = emb_sum + emb_t.astype(jnp.float32)
        x = _maybe_project(params, emb_t.astype(dtype))
        hidden, k_ctx, v_ctx = stack_decode_dense_cache(
            params["layers"], params["norm"], x, i + 1, k_ctx, v_ctx, spec
        )
        logits = linear(hidden, _index_head(params["lm_heads"], i))
        key, sub = jax.random.split(key)
        tok = sample_top_k(logits, temperatures, sub, top_k)
        return (k_ctx, v_ctx, tok, emb_sum, key), tok

    emb_sum0 = jnp.zeros((B, Dt), jnp.float32)
    carry = (k_ctx, v_ctx, tok1, emb_sum0, key)
    steps = jnp.arange(1, NUM_STEPS, dtype=jnp.int32)
    (k_ctx, v_ctx, last_tok, emb_sum, _), toks = jax.lax.scan(step, carry, steps)

    tokens = jnp.concatenate([tok1[None], toks], axis=0).T  # [B, 15]
    # Final token (cb15) embeds through table 14 for the next-frame sum
    # (interface.py:1276-1281 uses predictor tables 0..14 on tokens 1..15).
    emb_sum = emb_sum + params["codec_embeddings"][NUM_STEPS - 1][last_tok].astype(
        jnp.float32
    )
    return tokens, emb_sum.astype(dtype)
