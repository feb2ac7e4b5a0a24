import json

import pytest

from nano_qwen3tts_tpu.config import (
    EngineConfig,
    Qwen3TTSConfig,
    preset_config,
)


def test_engine_config_defaults():
    cfg = EngineConfig()
    assert cfg.max_model_len == 1024
    assert cfg.kvcache_block_size % 64 == 0
    assert cfg.max_blocks_per_seq == 1024 // cfg.kvcache_block_size


def test_engine_config_invariants():
    with pytest.raises(AssertionError):
        EngineConfig(kvcache_block_size=100)
    with pytest.raises(AssertionError):
        EngineConfig(max_num_batched_tokens=512, max_model_len=1024)


def test_model_config_tree_from_dict():
    d = {
        "talker_config": {
            "hidden_size": 1024,
            "num_hidden_layers": 20,
            "num_key_value_heads": 2,
            "spk_id": {"vivian": 3000},
            "codec_language_id": {"english": 4100},
            "rope_scaling": {
                "mrope_section": [24, 20, 20],
                "attention_scaling": 1.0,
                "type": "default",
            },
            "code_predictor_config": {
                "hidden_size": 1024,
                "num_hidden_layers": 5,
                "head_dim": 128,
            },
        },
        "tts_model_size": "1.7b",
        "unknown_future_field": 42,
    }
    cfg = Qwen3TTSConfig.from_dict(d)
    assert cfg.talker_config.hidden_size == 1024
    assert cfg.talker_config.code_predictor_config.talker_hidden_size == 1024
    assert cfg.talker_config.spk_id["vivian"] == 3000
    assert cfg.talker_config.rope_scaling["rope_type"] == "default"
    assert cfg.talker_config.attention_scaling == 1.0


def test_config_from_pretrained(tmp_path):
    d = {"talker_config": {"hidden_size": 64, "num_hidden_layers": 2}}
    (tmp_path / "config.json").write_text(json.dumps(d))
    cfg = Qwen3TTSConfig.from_pretrained(str(tmp_path))
    assert cfg.talker_config.hidden_size == 64


def test_presets():
    tiny = preset_config("tiny")
    assert tiny.talker_config.num_hidden_layers == 2
    big = preset_config("1.7b")
    assert big.talker_config.num_hidden_layers == 20
    assert big.talker_config.code_predictor_config.head_dim == 128
    small = preset_config("0.6b")
    assert small.talker_config.hidden_size == 768
    # predictor embedding tables live at talker hidden dim
    assert small.talker_config.code_predictor_config.talker_hidden_size == 768
