"""Pooled on-device streaming decode: the codes-pool serving path.

Round-5 serving architecture (VERDICT r4 next #1): every engine step
scatters its frames into a device-resident codes pool
(engine/fused_step.write_codes_pool), and the server decodes streaming PCM
windows straight from the pool (audio/codec.dispatch_pool_pcm16 +
server/app.DecodeWorker pooled jobs) — the reference re-uploads every
window from the host instead (examples/server.py:645-673). These tests pin:

* the pool rows mirror the frames the engine emitted (every dispatch path);
* pooled window decode == the classic upload-the-window decode, sample
  for sample, including the context trim;
* slot holds keep pool rows alive past request finish, and release frees;
* the chunk-policy window-shape enumeration used to gate/warm the path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nano_qwen3tts_tpu.config import EngineConfig, preset_config
from nano_qwen3tts_tpu.engine.engine import TTSEngine
from nano_qwen3tts_tpu.models.weights import init_predictor_params, init_talker_params

CFG = preset_config("tiny")
TCFG = CFG.talker_config


@pytest.fixture(scope="module")
def engine():
    ecfg = EngineConfig(
        max_model_len=128,
        kvcache_block_size=16,
        max_num_batched_tokens=1024,
        max_active_streams=4,
        decode_buckets=(1, 2, 4),
        prefill_buckets=(16, 32),
        eos=2150,
        frames_per_step=4,
    )
    tp = init_talker_params(TCFG, jax.random.PRNGKey(0), dtype=jnp.float32)
    pp = init_predictor_params(
        TCFG.code_predictor_config, jax.random.PRNGKey(1), dtype=jnp.float32
    )
    pad = np.asarray(tp["codec_embedding"][0], np.float32)
    return TTSEngine(ecfg, CFG, tp, pp, tts_pad_embed=pad, num_kvcache_blocks=64)


def prompt(rng, L=10):
    return (rng.standard_normal((L, TCFG.hidden_size)) * 0.3).astype(np.float32)


def test_codes_pool_mirrors_emitted_frames(engine, rng):
    """Frames streamed to the host must equal the pool rows, for a stream
    crossing prefill + pipelined multi-frame decode dispatches."""
    info = {}
    rid = engine.add_request(
        prompt(rng), None, request_id="pool-a", max_frames=11, seed=3,
        ignore_eos=True, stream_info=info,
    )
    assert info["held"] and info["pooled"]
    frames = []
    for _ in range(40):
        for req_id, frame, fin in engine.step():
            if req_id == rid and isinstance(frame, list):
                frames.append(frame)
        if not engine.has_work():
            break
    assert len(frames) == 11
    pool = np.asarray(engine.runner.codes_pool)
    got = pool[info["slot"], : len(frames)]
    assert np.array_equal(got, np.asarray(frames, np.int32))
    engine.release_stream_hold(info)


def test_slot_hold_keeps_rows_until_release(engine, rng):
    free0 = sorted(engine.runner._free_slots_by_shard[0])
    info = {}
    engine.add_request(
        prompt(rng), None, request_id="pool-b", max_frames=3, seed=4,
        ignore_eos=True, stream_info=info,
    )
    while engine.has_work():
        engine.step()
    # engine released its reference at finish, but the caller hold pins it
    assert info["slot"] not in engine.runner._free_slots_by_shard[info["shard"]]
    engine.release_stream_hold(info)
    assert info["slot"] in engine.runner._free_slots_by_shard[info["shard"]]
    assert sorted(engine.runner._free_slots_by_shard[0]) == free0
    # idempotent
    engine.release_stream_hold(info)
    assert sorted(engine.runner._free_slots_by_shard[0]) == free0


def test_pooled_window_decode_matches_classic():
    """dispatch_pool_pcm16 == decode_pcm16 (bit-identical at matched batch
    composition) for every chunk shape of the default policy, including the
    on-device context trim. Cross-batch-shape decodes differ by a few int16
    LSB — inherent XLA conv-accumulation variation the classic micro-batched
    path already has across concurrency levels — so the exactness claim is
    pinned batch-for-batch."""
    from nano_qwen3tts_tpu.audio.codec import CodecConfig, SpeechTokenizer

    codec = SpeechTokenizer(CodecConfig.tiny(), seed=0)
    hop = codec.cfg.hop
    rng = np.random.default_rng(0)
    # a fake pool: 3 slots x 40 frames of random codes
    pool_np = rng.integers(
        0, codec.cfg.codebook_size, (4, 40, 16), dtype=np.int32
    )
    pool = jnp.asarray(pool_np)
    for T, ctx, new in [(4, 0, 4), (8, 4, 4), (12, 8, 4)]:
        slots = [1, 2, 3]
        starts = [0, 3, 7]
        dev = codec.dispatch_pool_pcm16(pool, slots, starts, T, ctx, new)
        pooled = np.asarray(dev)  # [Bb, new*hop]
        assert pooled.shape[1] == new * hop
        wins = np.stack(
            [pool_np[s, st : st + T] for s, st in zip(slots, starts)]
        )  # [3, T, 16]
        classic = codec.decode_pcm16(wins.transpose(0, 2, 1))
        for b in range(3):
            expect = classic[b][ctx * hop : (ctx + new) * hop]
            assert np.array_equal(pooled[b], expect), (T, ctx, new, b)


def test_stream_window_combos_default_policy():
    from nano_qwen3tts_tpu.server.app import StreamSettings, stream_window_combos

    combos = stream_window_combos(StreamSettings(
        chunk_size=4, context_size=8, first_chunk_count=8, first_chunk_size=4
    ))
    assert combos == {(4, 0, 4), (8, 4, 4), (12, 8, 4)}
    # a policy with a bigger first chunk stays bounded
    combos2 = stream_window_combos(StreamSettings(
        chunk_size=4, context_size=8, first_chunk_count=2, first_chunk_size=8
    ))
    assert (8, 0, 8) in combos2 and (12, 8, 4) in combos2
