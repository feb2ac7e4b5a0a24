"""Checkpoint loading: synthetic safetensors in the reference key layout.

Builds a fake ``model.safetensors`` with the exact key names the reference
checkpoints use (talker.* / talker.code_predictor.* — reference
models/qwen3_tts_talker.py:81-113, qwen3_tts_predictor.py:63-85) and checks
the stacked pytrees and the embeddings-only loader reproduce the tensors
(with the torch [out,in] -> [in,out] transpose).
"""

import json

import numpy as np
import pytest

from nano_qwen3tts_tpu.config import Qwen3TTSConfig, preset_config
from nano_qwen3tts_tpu.models.weights import load_models
from nano_qwen3tts_tpu.utils.embedding_loader import load_embeddings_only


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    cfg = preset_config("tiny")
    tc = cfg.talker_config
    pc = tc.code_predictor_config
    d = tc.actual_head_dim
    sd = {}

    def lin(out_dim, in_dim):
        return rng.standard_normal((out_dim, in_dim)).astype(np.float32)

    for i in range(tc.num_hidden_layers):
        p = f"talker.model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = lin(tc.num_attention_heads * d, tc.hidden_size)
        sd[p + "self_attn.k_proj.weight"] = lin(tc.num_key_value_heads * d, tc.hidden_size)
        sd[p + "self_attn.v_proj.weight"] = lin(tc.num_key_value_heads * d, tc.hidden_size)
        sd[p + "self_attn.o_proj.weight"] = lin(tc.hidden_size, tc.num_attention_heads * d)
        sd[p + "self_attn.q_norm.weight"] = rng.standard_normal(d).astype(np.float32)
        sd[p + "self_attn.k_norm.weight"] = rng.standard_normal(d).astype(np.float32)
        sd[p + "mlp.gate_proj.weight"] = lin(tc.intermediate_size, tc.hidden_size)
        sd[p + "mlp.up_proj.weight"] = lin(tc.intermediate_size, tc.hidden_size)
        sd[p + "mlp.down_proj.weight"] = lin(tc.hidden_size, tc.intermediate_size)
        sd[p + "input_layernorm.weight"] = rng.standard_normal(tc.hidden_size).astype(np.float32)
        sd[p + "post_attention_layernorm.weight"] = rng.standard_normal(tc.hidden_size).astype(np.float32)
    sd["talker.model.norm.weight"] = rng.standard_normal(tc.hidden_size).astype(np.float32)
    sd["talker.model.codec_embedding.weight"] = rng.standard_normal(
        (tc.vocab_size, tc.hidden_size)).astype(np.float32)
    sd["talker.model.text_embedding.weight"] = rng.standard_normal(
        (tc.text_vocab_size, tc.text_hidden_size)).astype(np.float32)
    sd["talker.codec_head.weight"] = lin(tc.vocab_size, tc.hidden_size)
    sd["talker.text_projection.linear_fc1.weight"] = lin(tc.text_hidden_size, tc.text_hidden_size)
    sd["talker.text_projection.linear_fc1.bias"] = rng.standard_normal(tc.text_hidden_size).astype(np.float32)
    sd["talker.text_projection.linear_fc2.weight"] = lin(tc.hidden_size, tc.text_hidden_size)
    sd["talker.text_projection.linear_fc2.bias"] = rng.standard_normal(tc.hidden_size).astype(np.float32)

    pd = pc.head_dim
    for i in range(pc.num_hidden_layers):
        p = f"talker.code_predictor.model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = lin(pc.num_attention_heads * pd, pc.hidden_size)
        sd[p + "self_attn.k_proj.weight"] = lin(pc.num_key_value_heads * pd, pc.hidden_size)
        sd[p + "self_attn.v_proj.weight"] = lin(pc.num_key_value_heads * pd, pc.hidden_size)
        sd[p + "self_attn.o_proj.weight"] = lin(pc.hidden_size, pc.num_attention_heads * pd)
        sd[p + "self_attn.q_norm.weight"] = rng.standard_normal(pd).astype(np.float32)
        sd[p + "self_attn.k_norm.weight"] = rng.standard_normal(pd).astype(np.float32)
        sd[p + "mlp.gate_proj.weight"] = lin(pc.intermediate_size, pc.hidden_size)
        sd[p + "mlp.up_proj.weight"] = lin(pc.intermediate_size, pc.hidden_size)
        sd[p + "mlp.down_proj.weight"] = lin(pc.hidden_size, pc.intermediate_size)
        sd[p + "input_layernorm.weight"] = rng.standard_normal(pc.hidden_size).astype(np.float32)
        sd[p + "post_attention_layernorm.weight"] = rng.standard_normal(pc.hidden_size).astype(np.float32)
    sd["talker.code_predictor.model.norm.weight"] = rng.standard_normal(pc.hidden_size).astype(np.float32)
    for i in range(pc.num_code_groups - 1):
        sd[f"talker.code_predictor.model.codec_embedding.{i}.weight"] = rng.standard_normal(
            (pc.vocab_size, tc.hidden_size)).astype(np.float32)
        sd[f"talker.code_predictor.lm_head.{i}.weight"] = lin(pc.vocab_size, pc.hidden_size)
    # speaker_encoder keys must be skipped by the remap
    sd["speaker_encoder.blocks.0.weight"] = rng.standard_normal(4).astype(np.float32)

    out = tmp_path_factory.mktemp("ckpt")
    save_file(sd, str(out / "model.safetensors"))
    cfg_dict = {
        "talker_config": {
            "vocab_size": tc.vocab_size, "hidden_size": tc.hidden_size,
            "intermediate_size": tc.intermediate_size,
            "num_hidden_layers": tc.num_hidden_layers,
            "num_attention_heads": tc.num_attention_heads,
            "num_key_value_heads": tc.num_key_value_heads,
            "head_dim": tc.head_dim,
            "text_vocab_size": tc.text_vocab_size,
            "text_hidden_size": tc.text_hidden_size,
            "code_predictor_config": {
                "vocab_size": pc.vocab_size, "hidden_size": pc.hidden_size,
                "intermediate_size": pc.intermediate_size,
                "num_hidden_layers": pc.num_hidden_layers,
                "num_attention_heads": pc.num_attention_heads,
                "num_key_value_heads": pc.num_key_value_heads,
                "head_dim": pc.head_dim,
            },
        },
        "tts_model_size": "tiny",
    }
    (out / "config.json").write_text(json.dumps(cfg_dict))
    return str(out), sd


def test_load_models_remap_and_transpose(ckpt_dir):
    path, sd = ckpt_dir
    import jax.numpy as jnp

    cfg = Qwen3TTSConfig.from_pretrained(path)
    tp, pp = load_models(path, cfg, dtype=jnp.float32)
    # layer 1 q_proj: transposed
    np.testing.assert_allclose(
        np.asarray(tp["layers"]["q_w"][1]),
        sd["talker.model.layers.1.self_attn.q_proj.weight"].T,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(tp["codec_head_w"]),
        sd["talker.codec_head.weight"].T, rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(tp["text_projection"]["fc1_b"]),
        sd["talker.text_projection.linear_fc1.bias"], rtol=1e-6,
    )
    # predictor stacked tables/heads
    np.testing.assert_allclose(
        np.asarray(pp["codec_embeddings"][3]),
        sd["talker.code_predictor.model.codec_embedding.3.weight"], rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pp["lm_heads"][14]),
        sd["talker.code_predictor.lm_head.14.weight"].T, rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(pp["layers"]["down_w"][0]),
        sd["talker.code_predictor.model.layers.0.mlp.down_proj.weight"].T,
        rtol=1e-6,
    )
    # predictor hidden == talker hidden in tiny preset -> no projection
    assert "proj_w" not in pp


def test_embeddings_only_loader(ckpt_dir):
    path, sd = ckpt_dir
    cfg, tables = load_embeddings_only(path)
    np.testing.assert_allclose(
        tables.text_embedding, sd["talker.model.text_embedding.weight"], rtol=1e-6
    )
    np.testing.assert_allclose(
        tables.codec_embedding, sd["talker.model.codec_embedding.weight"], rtol=1e-6
    )
    np.testing.assert_allclose(
        tables.fc2_w, sd["talker.text_projection.linear_fc2.weight"].T, rtol=1e-6
    )
    np.testing.assert_allclose(
        tables.predictor_codec[2],
        sd["talker.code_predictor.model.codec_embedding.2.weight"], rtol=1e-6,
    )


def test_interface_from_pretrained_end_to_end(ckpt_dir):
    """Full from_pretrained -> sync generation on the synthetic checkpoint."""
    path, _ = ckpt_dir
    import jax.numpy as jnp

    from nano_qwen3tts_tpu.config import EngineConfig
    from nano_qwen3tts_tpu.interface import Qwen3TTSInterface
    from test_interface import stub_tokenizer

    cfg = Qwen3TTSConfig.from_pretrained(path)
    cfg.tts_bos_token_id, cfg.tts_eos_token_id, cfg.tts_pad_token_id = 505, 506, 507
    cfg.talker_config.codec_language_id = {"english": 4100}
    iface = Qwen3TTSInterface(
        model_path=path,
        model_config=cfg,
        engine_config=EngineConfig(
            max_model_len=128, kvcache_block_size=16, max_num_batched_tokens=1024,
            max_active_streams=4, decode_buckets=(1, 2), prefill_buckets=(64, 128),
        ),
        tokenizer=stub_tokenizer,
        dtype=jnp.float32,
    )
    frames = list(
        iface.generate_voice_design("hello", "calm", "English", max_frames=3)
    )
    assert 1 <= len(frames) <= 3
