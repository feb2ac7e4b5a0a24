"""Embeddings-only checkpoint loading for prompt preparation.

Parity with reference utils/embedding_loader.py:17-112. In the reference
this avoids triple-loading full models across the main + two worker
processes; in the single-process TPU engine it serves lightweight clients
(e.g. a prep-only frontend) and keeps the prep tables in host numpy rather
than on the TPU.
"""

from __future__ import annotations

import numpy as np

from nano_qwen3tts_tpu.config import Qwen3TTSConfig
from nano_qwen3tts_tpu.utils.generation import EmbeddingTables


def load_embeddings_only(model_path: str) -> tuple[Qwen3TTSConfig, EmbeddingTables]:
    from nano_qwen3tts_tpu.models.weights import load_checkpoint

    cfg = Qwen3TTSConfig.from_pretrained(model_path)
    tc = cfg.talker_config
    sd = load_checkpoint(model_path)

    def np32(key):
        return np.asarray(sd[key], dtype=np.float32)

    t = "talker."
    text_key = t + "model.text_embedding.weight"
    codec_key = t + "model.codec_embedding.weight"
    if codec_key not in sd and t + "model.embed_tokens.weight" in sd:
        codec_key = t + "model.embed_tokens.weight"  # HF fallback naming
    n_cb = tc.code_predictor_config.num_code_groups - 1
    tables = EmbeddingTables(
        text_embedding=np32(text_key),
        codec_embedding=np32(codec_key),
        fc1_w=np32(t + "text_projection.linear_fc1.weight").T,
        fc1_b=np32(t + "text_projection.linear_fc1.bias"),
        fc2_w=np32(t + "text_projection.linear_fc2.weight").T,
        fc2_b=np32(t + "text_projection.linear_fc2.bias"),
        predictor_codec=np.stack(
            [
                np32(t + f"code_predictor.model.codec_embedding.{i}.weight")
                for i in range(n_cb)
            ]
        ),
    )
    return cfg, tables
