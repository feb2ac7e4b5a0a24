"""Graceful overload: bursts beyond max_active_streams queue, never 500.

VERDICT r4 next #4: the reference queues admissions in scheduler.waiting up
to max_num_seqs (engine/scheduler.py:29-48); this engine used to hard-raise
at max_active_streams because pool-slot acquisition was coupled to
add_request. Now slots attach lazily (engine._assign_parked_slots) and only
the bounded queue rejects (EngineOverloaded -> HTTP 503).
"""

import asyncio

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nano_qwen3tts_tpu.config import EngineConfig, preset_config
from nano_qwen3tts_tpu.engine.engine import EngineOverloaded, TTSEngine
from nano_qwen3tts_tpu.models.weights import init_predictor_params, init_talker_params

CFG = preset_config("tiny")
TCFG = CFG.talker_config


def make_engine(max_streams=2, max_num_seqs=8):
    ecfg = EngineConfig(
        max_model_len=128,
        kvcache_block_size=16,
        max_num_batched_tokens=1024,
        max_active_streams=max_streams,
        max_num_seqs=max_num_seqs,
        decode_buckets=(1, 2),
        prefill_buckets=(16, 32),
        eos=2150,
    )
    tp = init_talker_params(TCFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    pp = init_predictor_params(
        TCFG.code_predictor_config, jax.random.PRNGKey(1), dtype=jnp.float32
    )
    pad = np.asarray(tp["codec_embedding"][0], np.float32)
    return TTSEngine(ecfg, CFG, tp, pp, tts_pad_embed=pad, num_kvcache_blocks=64)


def prompt(rng, L=10):
    return (rng.standard_normal((L, TCFG.hidden_size)) * 0.3).astype(np.float32)


def test_burst_beyond_max_active_streams_drains(rng):
    """2x max_active_streams simultaneous arrivals all complete: the excess
    queues for freed slots instead of raising."""
    engine = make_engine(max_streams=2, max_num_seqs=16)
    n = 4  # 2x the slot count
    rids = [
        engine.add_request(prompt(rng), None, request_id=f"b{i}",
                           max_frames=3, ignore_eos=True)
        for i in range(n)
    ]
    # the excess requests are parked (no slot yet)
    parked = [
        s for s in engine.scheduler.waiting if s.pool_slot < 0
    ]
    assert len(parked) == 2
    got = {r: 0 for r in rids}
    for _ in range(60):
        for rid, frame, fin in engine.step():
            if isinstance(frame, Exception):
                raise AssertionError(f"request {rid} failed: {frame}")
            if isinstance(frame, list):
                got[rid] += 1
        if not engine.has_work():
            break
    assert all(v == 3 for v in got.values()), got
    assert not engine.has_work()
    # every slot recycled
    assert sum(len(f) for f in engine.runner._free_slots_by_shard) == 2


def test_bounded_queue_rejects_loudly(rng):
    engine = make_engine(max_streams=1, max_num_seqs=3)
    for i in range(3):
        engine.add_request(prompt(rng), None, request_id=f"q{i}",
                           max_frames=2, ignore_eos=True)
    with pytest.raises(EngineOverloaded):
        engine.add_request(prompt(rng), None, request_id="q3", max_frames=2)
    assert engine.can_admit() is False
    # draining restores admission
    while engine.has_work():
        engine.step()
    assert engine.can_admit() is True


def test_parked_request_cleared_before_slot(rng):
    """clear_request on a parked (slotless) request must not corrupt slot
    accounting."""
    engine = make_engine(max_streams=1, max_num_seqs=8)
    engine.add_request(prompt(rng), None, request_id="a", max_frames=2,
                       ignore_eos=True)
    engine.add_request(prompt(rng), None, request_id="b", max_frames=2,
                       ignore_eos=True)
    engine.clear_request("b")  # parked, never got a slot
    while engine.has_work():
        engine.step()
    assert sum(len(f) for f in engine.runner._free_slots_by_shard) == 1


def test_stream_info_attaches_when_parked_request_gets_slot(rng):
    """A parked request's serving handle is published at slot attach; a
    caller hold pins the slot past request finish (the server's
    final-chunk window), and releasing it unblocks the parked queue —
    the server-side lifecycle, end to end."""
    engine = make_engine(max_streams=1, max_num_seqs=8)
    i1, i2 = {}, {}
    engine.add_request(prompt(rng), None, request_id="h1", max_frames=2,
                       ignore_eos=True, stream_info=i1)
    engine.add_request(prompt(rng), None, request_id="h2", max_frames=2,
                       ignore_eos=True, stream_info=i2)
    assert i1.get("held") and "held" not in i2  # h2 parked
    # run until h1 finishes: its slot is engine-released but still pinned
    # by the caller hold, so h2 stays parked
    done1 = False
    for _ in range(20):
        for rid, frame, fin in engine.step():
            done1 = done1 or (rid == "h1" and fin)
        if done1:
            break
    assert done1
    for _ in range(3):
        engine.step()  # h2 must NOT be admitted while the hold pins it
    assert "held" not in i2
    # the server's final-chunk decode completes -> hold released
    engine.release_stream_hold(i1)
    frames2 = 0
    for _ in range(20):
        for rid, frame, fin in engine.step():
            if rid == "h2" and isinstance(frame, list):
                frames2 += 1
        if not engine.has_work():
            break
    assert i2.get("held")  # handle published at lazy attach
    assert frames2 == 2
    engine.release_stream_hold(i2)
    assert len(engine.runner._free_slots_by_shard[0]) == 1  # slot recycled
