import numpy as np
import pytest

from nano_qwen3tts_tpu.config import EngineConfig
from nano_qwen3tts_tpu.engine.block_manager import BlockManager, GARBAGE_BLOCK
from nano_qwen3tts_tpu.engine.scheduler import Scheduler
from nano_qwen3tts_tpu.engine.sequence import Sequence, SequenceStatus


def make_seq(L=10, request_id=None, block_size=128):
    seq = Sequence(
        np.zeros((L, 8), dtype=np.float32),
        request_id=request_id,
        block_size=block_size,
    )
    # The engine assigns a pool slot at admission (engine._attach_slot);
    # a slotless (pool_slot < 0) sequence is parked by the scheduler until
    # a slot frees (graceful overload). These unit tests exercise the
    # scheduler alone, so stand in for the engine's assignment.
    seq.pool_slot = 1
    return seq


def make_sched(blocks=32, block_size=128, **kw):
    cfg = EngineConfig(kvcache_block_size=block_size, **kw)
    return Scheduler(cfg, num_kvcache_blocks=blocks)


class TestBlockManager:
    def test_garbage_block_reserved(self):
        bm = BlockManager(8, 128)
        assert GARBAGE_BLOCK == 0
        assert 0 not in bm.free_block_ids
        table, cached = bm.allocate_prefill(200)
        assert 0 not in table and cached == 0
        assert len(table) == 2

    def test_alloc_dealloc_roundtrip(self):
        bm = BlockManager(8, 128)
        t1, _ = bm.allocate_prefill(300)
        t2, _ = bm.allocate_prefill(300)
        assert bm.num_free_blocks == 1  # 7 usable - 2*3 used
        bm.deallocate(t1)
        bm.deallocate(t2)
        assert bm.num_free_blocks == 7

    def test_append_boundary(self):
        bm = BlockManager(8, 4)
        table, _ = bm.allocate_prefill(4)  # exactly one full block
        assert len(table) == 1
        # next write at kv_len=4 crosses boundary -> needs a block
        assert bm.can_append(4, table)
        bm.may_append(4, table)
        assert len(table) == 2
        # writes within the block need nothing
        bm.may_append(5, table)
        assert len(table) == 2

    def test_prefix_cache_token_ids(self):
        bm = BlockManager(8, 4)
        toks = list(range(8))
        t1, c1 = bm.allocate_prefill(8, toks)
        assert c1 == 0
        t2, c2 = bm.allocate_prefill(8, toks)
        assert c2 == 8  # both full blocks hit
        assert t1 == t2
        assert bm.blocks[t1[0]].ref_count == 2

    def test_exhaustion(self):
        bm = BlockManager(4, 128)  # 3 usable
        assert bm.can_allocate(3)
        assert not bm.can_allocate(4)


class TestScheduler:
    def test_prefill_then_decode_gating(self):
        s = make_sched()
        seq = make_seq(10, request_id="r1")
        s.add(seq)
        batch, is_prefill = s.schedule()
        assert is_prefill and batch == [seq]
        s.postprocess_prefill(batch, [5])
        assert seq.kv_len == 10
        # no decode embed fed yet -> nothing runnable
        batch, is_prefill = s.schedule()
        assert batch == []
        # feed and schedule
        assert s.feed_decode("r1", np.zeros(8, np.float32))
        batch, is_prefill = s.schedule()
        assert batch == [seq] and not is_prefill
        assert seq.rope_position == 11  # reference off-by-one: kv_len + 1
        assert seq.next_slot == seq.block_table[0] * 128 + 10
        s.postprocess_decode(batch, [7])
        assert seq.kv_len == 11 and seq.decode_input_embeds is None

    def test_eos_finishes_and_frees(self):
        s = make_sched()
        seq = make_seq(10, request_id="r1")
        s.add(seq)
        batch, _ = s.schedule()
        s.postprocess_prefill(batch, [s.eos])
        assert seq.is_finished
        assert s.block_manager.num_free_blocks == 31
        assert "r1" not in s.request_id_to_seq

    def test_prefill_admission_budget(self):
        s = make_sched(max_num_batched_tokens=1024, max_model_len=1024)
        seqs = [make_seq(600, request_id=f"r{i}") for i in range(3)]
        for q in seqs:
            s.add(q)
        batch, is_prefill = s.schedule()
        assert is_prefill and len(batch) == 1  # 600+600 > 1024
        s.postprocess_prefill(batch, [1])
        batch2, is_prefill = s.schedule()
        assert is_prefill and len(batch2) == 1

    def test_block_exhaustion_blocks_admission(self):
        s = make_sched(blocks=3, block_size=128)  # 2 usable blocks
        s.add(make_seq(300, request_id="big"))  # needs 3 blocks
        batch, _ = s.schedule()
        assert batch == []

    def test_decode_preemption(self):
        # 2 usable blocks, block_size 4: two seqs of 4 tokens each own 1 block.
        s = make_sched(blocks=3, block_size=4)
        a, b = make_seq(4, "a", 4), make_seq(4, "b", 4)
        s.add(a), s.add(b)
        batch, _ = s.schedule()
        s.postprocess_prefill(batch, [1, 1])
        # both need a new block on the next decode; only 0 free -> preempt b
        s.feed_decode("a", np.zeros(8, np.float32))
        s.feed_decode("b", np.zeros(8, np.float32))
        batch, is_prefill = s.schedule()
        assert not is_prefill
        assert batch == [a]
        assert b.status == SequenceStatus.WAITING and b.block_table == []

    def test_clear_request(self):
        s = make_sched()
        seq = make_seq(10, request_id="r1")
        s.add(seq)
        s.schedule()
        s.clear_request("r1")
        assert seq.is_finished
        assert s.block_manager.num_free_blocks == 31
        assert not s.running

    def test_preemption_targets_same_shard(self):
        """Data-sharded serving: evicting another shard's sequence cannot
        free blocks for the blocked one — the victim must come from the
        SAME shard's pool (engine/scheduler.py schedule loop)."""
        cfg = EngineConfig(kvcache_block_size=4)
        s = Scheduler(cfg, num_kvcache_blocks=3, num_shards=2)  # 2 usable/shard
        a = make_seq(4, "a", 4)
        b = make_seq(4, "b", 4)   # shard 1 — most recent, but wrong shard
        c = make_seq(4, "c", 4)   # shard 0 — the correct victim
        a.data_shard, c.data_shard = 0, 0
        b.data_shard = 1
        for q in (a, c, b):
            s.add(q)
        batch, _ = s.schedule()
        s.postprocess_prefill(batch, [1, 1, 1])
        assert s.block_managers[0].num_free_blocks == 0
        for q in (a, b, c):
            s.feed_decode(q.request_id, np.zeros(8, np.float32))
        batch, is_prefill = s.schedule()
        assert not is_prefill
        # a (shard 0) needed a block: c (same shard) evicted, b untouched
        assert a in batch and b in batch and c not in batch
        assert c.status == SequenceStatus.WAITING and c.block_table == []
        assert b.block_table != []

    def test_feed_unknown_request(self):
        s = make_sched()
        assert not s.feed_decode("nope", None)

    def test_fifo_order_stable(self):
        s = make_sched()
        seqs = [make_seq(4, f"r{i}") for i in range(5)]
        for q in seqs:
            s.add(q)
        batch, _ = s.schedule()
        assert [q.request_id for q in batch] == [f"r{i}" for i in range(5)]
        s.postprocess_prefill(batch, [1] * 5)
        for q in seqs:
            s.feed_decode(q.request_id, np.zeros(8, np.float32))
        batch, _ = s.schedule()
        assert [q.request_id for q in batch] == [f"r{i}" for i in range(5)]


def test_sequence_kv_accounting():
    seq = make_seq(130, block_size=128)
    assert seq.prompt_len == 130
    assert seq.blocks_for(seq.prompt_len) == 2
    seq.block_table = [3, 4]
    seq.kv_len = 130
    assert seq.rope_position == 131
    assert seq.next_slot == 4 * 128 + 2
