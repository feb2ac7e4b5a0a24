"""Multi-frame decode scan: equivalence with single-frame stepping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_qwen3tts_tpu.config import EngineConfig, preset_config
from nano_qwen3tts_tpu.engine.engine import TTSEngine
from nano_qwen3tts_tpu.models.weights import init_predictor_params, init_talker_params

CFG = preset_config("tiny")
TCFG = CFG.talker_config


def make_engine(frames_per_step, pipeline_depth=1):
    ecfg = EngineConfig(
        max_model_len=128,
        kvcache_block_size=16,
        max_num_batched_tokens=1024,
        max_active_streams=8,
        decode_buckets=(1, 2, 4, 8),
        prefill_buckets=(16, 32, 64, 128),
        frames_per_step=frames_per_step,
        pipeline_depth=pipeline_depth,
    )
    tp = init_talker_params(TCFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    pp = init_predictor_params(
        TCFG.code_predictor_config, jax.random.PRNGKey(1), dtype=jnp.float32
    )
    pad = np.asarray(tp["codec_embedding"][0], np.float32)
    return TTSEngine(ecfg, CFG, tp, pp, tts_pad_embed=pad, num_kvcache_blocks=64)


def test_multiframe_stream(rng):
    eng = make_engine(4)
    prompt = (rng.standard_normal((10, TCFG.hidden_size)) * 0.3).astype(np.float32)
    trail = (rng.standard_normal((6, TCFG.hidden_size)) * 0.3).astype(np.float32)
    frames = list(eng.generate(prompt, trail, max_frames=10, seed=3))
    assert 1 <= len(frames) <= 10
    assert all(len(f) == 16 for f in frames)
    assert not eng.has_work()
    assert eng.scheduler.block_manager.num_free_blocks == 63
    assert len(eng.runner._free_pool_slots) == 8


def test_multiframe_respects_max_frames(rng):
    eng = make_engine(4)
    prompt = (rng.standard_normal((8, TCFG.hidden_size)) * 0.3).astype(np.float32)
    # max_frames=6 is not a multiple of 4: 1 (prefill) + 4 + trimmed tail
    frames = list(eng.generate(prompt, None, max_frames=6, seed=1))
    assert len(frames) <= 6
    assert not eng.has_work()


def test_multiframe_concurrent(rng):
    eng = make_engine(4)
    rids = [
        eng.add_request(
            (rng.standard_normal((8, TCFG.hidden_size)) * 0.3).astype(np.float32),
            None, request_id=f"r{i}", max_frames=9,
        )
        for i in range(3)
    ]
    got = {r: 0 for r in rids}
    for _ in range(40):
        res = eng.step()
        if not res and not eng.has_work():
            break
        for rid, frame, fin in res:
            if frame is not None:
                got[rid] += 1
    for rid in rids:
        assert 1 <= got[rid] <= 9
    assert eng.scheduler.block_manager.num_free_blocks == 63


def test_pipeline_depth_equivalent_frames(rng):
    """Depth-3 pipelining must emit exactly the frames depth-1 emits (the
    PRNG stream advances per dispatch on device; pipelining only changes
    when the host blocks, not what the device computes)."""
    prompt = (rng.standard_normal((10, TCFG.hidden_size)) * 0.3).astype(np.float32)
    trail = (rng.standard_normal((6, TCFG.hidden_size)) * 0.3).astype(np.float32)

    def run(depth):
        eng = make_engine(4, depth)
        # pin the engine PRNG (base_key is random per Runner instance)
        eng.runner.base_key = jax.random.PRNGKey(1234)
        eng.runner._dev_key = jax.random.fold_in(eng.runner.base_key, 0x5EED)
        return list(eng.generate(prompt, trail, max_frames=12, seed=5))

    assert run(1) == run(3)


def test_pipeline_depth_cleanup(rng):
    """All blocks/pool slots freed after a deep-pipelined concurrent run."""
    eng = make_engine(4, 3)
    for i in range(3):
        eng.add_request(
            (rng.standard_normal((8, TCFG.hidden_size)) * 0.3).astype(np.float32),
            None, request_id=f"r{i}", max_frames=9,
        )
    for _ in range(60):
        eng.step()
        if not eng.has_work():
            break
    assert not eng.has_work()
    assert eng.scheduler.block_manager.num_free_blocks == 63
    assert len(eng.runner._free_pool_slots) == 8


def test_multiframe_near_model_len_falls_back(rng):
    """Lanes near max_model_len must not overflow KV (fallback to 1-frame)."""
    eng = make_engine(4)
    # prompt 120 of max 128: only 8 decode writes fit
    prompt = (rng.standard_normal((120, TCFG.hidden_size)) * 0.3).astype(np.float32)
    frames = list(eng.generate(prompt, None, max_frames=50, seed=2))
    # must terminate via the max_model_len guard without assertion failures
    assert len(frames) <= 9  # 1 prefill frame + 8 decode writes
    assert not eng.has_work()
    assert eng.scheduler.block_manager.num_free_blocks == 63


def test_unbounded_stream_terminates_at_model_len(rng):
    """Regression: a stream that never hits EOS must terminate cleanly at
    max_model_len under pipelined multi-frame stepping (previously grew a
    block table past max_blocks_per_seq and killed the engine loop)."""
    eng = make_engine(4)
    prompt = (rng.standard_normal((30, TCFG.hidden_size)) * 0.3).astype(np.float32)
    rid = eng.add_request(prompt, None, request_id="cap", ignore_eos=True)
    frames = 0
    finished = False
    for _ in range(80):
        res = eng.step()
        for r, f, fin in res:
            if f is not None:
                frames += 1
            finished = finished or fin
        if finished and not eng.has_work():
            break
    assert finished
    assert frames <= 128 - 30 + 1
    assert not eng.has_work()
    assert eng.scheduler.block_manager.num_free_blocks == 63
