"""Continuous-batching scheduler for the talker stream.

Parity with the reference's Scheduler/TalkerScheduler
(engine/scheduler.py:8-79, engine/llm_engine/talker_llm_engine.py:11-83):

* prefill-first admission bounded by ``max_num_seqs`` /
  ``max_num_batched_tokens`` / free blocks;
* decode schedules only sequences whose ``decode_input_embeds`` the caller
  has fed (caller-driven decode — one engine step per codec frame);
* preemption: evict the most recent running sequence when blocks run out;
* ``request_id -> Sequence`` tracking with ``clear_request`` for cancel.

The predictor needs no scheduler here: its whole 17-token run is one fused
scan inside the frame step (see engine/runner.py), which is the TPU answer
to the reference's separate predictor engine + worker process.
"""

from __future__ import annotations

from collections import deque
from typing import Optional

from nano_qwen3tts_tpu.config import EngineConfig
from nano_qwen3tts_tpu.engine.block_manager import BlockManager
from nano_qwen3tts_tpu.engine.sequence import Sequence, SequenceStatus


class Scheduler:
    def __init__(
        self,
        config: EngineConfig,
        num_kvcache_blocks: Optional[int] = None,
        num_shards: int = 1,
    ):
        self.max_num_seqs = config.max_num_seqs
        self.max_num_batched_tokens = config.max_num_batched_tokens
        self.eos = config.eos
        n_blocks = num_kvcache_blocks or config.num_kvcache_blocks
        assert n_blocks > 1, "num_kvcache_blocks must be set before scheduling"
        # Data-sharded serving: one independent block pool per data shard
        # (num_kvcache_blocks is per shard); a request allocates only from
        # the pool of the shard it was pinned to (Sequence.data_shard).
        self.num_shards = num_shards
        self.block_managers = [
            self._make_block_manager(n_blocks, config.kvcache_block_size)
            for _ in range(num_shards)
        ]
        self.waiting: deque[Sequence] = deque()
        self.running: deque[Sequence] = deque()
        self.request_id_to_seq: dict[str, Sequence] = {}
        # Live streams evicted under block pressure; the engine drains this
        # and surfaces each as a request failure (see preempt()).
        self.preempted_failures: list[Sequence] = []

    @property
    def block_manager(self):
        """Shard-0 pool (single-shard compatibility view)."""
        return self.block_managers[0]

    def bm_for(self, seq: Sequence):
        return self.block_managers[seq.data_shard]

    @staticmethod
    def _make_block_manager(n_blocks: int, block_size: int):
        """Prefer the C++ allocator (native/engine_core.cpp) when built;
        the Python BlockManager is the semantics oracle and fallback."""
        import os

        if os.environ.get("NATIVE_ENGINE_CORE", "1") != "0":
            try:
                from nano_qwen3tts_tpu.engine.native_bridge import (
                    NativeBlockManager,
                )

                return NativeBlockManager(n_blocks, block_size)
            except Exception:
                pass
        return BlockManager(n_blocks, block_size)

    def is_finished(self) -> bool:
        return not self.waiting and not self.running

    def add(self, seq: Sequence):
        if seq.request_id is not None:
            self.request_id_to_seq[seq.request_id] = seq
        self.waiting.append(seq)

    def feed_decode(self, request_id: str, embeds) -> bool:
        """Feed the next-frame embedding for a live request.

        Mirrors TalkerLLMEngine.add_request's repeat-call routing
        (talker_llm_engine.py:102-105). Returns False if unknown request.
        """
        seq = self.request_id_to_seq.get(request_id)
        if seq is None:
            return False
        seq.decode_input_embeds = embeds
        return True

    def clear_request(self, request_id: str):
        seq = self.request_id_to_seq.pop(request_id, None)
        if seq is None:
            return
        self.bm_for(seq).deallocate(seq.block_table)
        if seq in self.running:
            self.running.remove(seq)
        if seq in self.waiting:
            self.waiting.remove(seq)
        seq.status = SequenceStatus.FINISHED

    # -- scheduling ---------------------------------------------------------

    def schedule(self) -> tuple[list[Sequence], bool]:
        """Return (sequences, is_prefill). Empty list = nothing runnable."""
        scheduled: list[Sequence] = []
        num_seqs = 0
        num_tokens = 0
        # Prefill admission (reference scheduler.py:29-48).
        while self.waiting and num_seqs < self.max_num_seqs:
            seq = self.waiting[0]
            if seq.pool_slot < 0:
                # parked past max_active_streams: waits (FIFO) for a freed
                # pool slot (engine._assign_parked_slots)
                break
            n_blocks = seq.blocks_for(seq.prompt_len)
            if (
                num_tokens + seq.prompt_len > self.max_num_batched_tokens
                or not self.bm_for(seq).can_allocate(n_blocks)
            ):
                break
            num_seqs += 1
            seq.block_table, _ = self.bm_for(seq).allocate_prefill(seq.prompt_len)
            num_tokens += seq.prompt_len
            seq.status = SequenceStatus.RUNNING
            self.waiting.popleft()
            self.running.append(seq)
            scheduled.append(seq)
        if scheduled:
            return scheduled, True

        # Decode: only sequences with a caller-fed embedding
        # (talker_llm_engine.py:35-59).
        for _ in range(len(self.running)):
            if not self.running or num_seqs >= self.max_num_seqs:
                break
            seq = self.running.popleft()
            if seq.decode_input_embeds is None:
                self.running.append(seq)
                continue
            bm = self.bm_for(seq)
            while not bm.can_append(seq.kv_len, seq.block_table):
                # Evict from the SAME shard's pool — freeing another shard's
                # blocks cannot unblock this sequence.
                victim = next(
                    (
                        q for q in reversed(self.running)
                        if q.data_shard == seq.data_shard
                    ),
                    None,
                )
                if victim is not None:
                    self.running.remove(victim)
                    self.preempt(victim)
                else:
                    self.preempt(seq)
                    break
            else:
                num_seqs += 1
                bm.may_append(seq.kv_len, seq.block_table)
                scheduled.append(seq)
        if not scheduled:
            return [], False
        self.running.extendleft(reversed(scheduled))
        return scheduled, False

    def preempt(self, seq: Sequence):
        """Evict a sequence when blocks run out.

        A sequence that has not yielded any frame yet restarts cleanly from
        its prompt embeddings (back to WAITING). A LIVE stream cannot: its
        already-yielded frames are not re-derivable, so it is finished and
        recorded in ``preempted_failures`` — the engine surfaces it to the
        client as a request failure. (The reference silently regenerates
        from the prompt instead, which desynchronizes the stream —
        reference scheduler.py:68-71.)
        """
        if seq.request_id is not None and seq.frames_emitted > 0:
            seq.status = SequenceStatus.FINISHED
            self.request_id_to_seq.pop(seq.request_id, None)
            self.bm_for(seq).deallocate(seq.block_table)
            self.preempted_failures.append(seq)
            return
        seq.status = SequenceStatus.WAITING
        seq.decode_input_embeds = None
        self.bm_for(seq).deallocate(seq.block_table)
        self.waiting.appendleft(seq)

    def drain_preempted(self) -> list[Sequence]:
        out, self.preempted_failures = self.preempted_failures, []
        return out

    # -- postprocess --------------------------------------------------------

    def postprocess_prefill(self, seqs: list[Sequence], token_ids: list[int]):
        for seq, tok in zip(seqs, token_ids):
            seq.kv_len = seq.prompt_len
            seq.last_token = tok
            self._maybe_finish(seq, tok)

    def postprocess_decode(self, seqs: list[Sequence], token_ids: list[int]):
        for seq, tok in zip(seqs, token_ids):
            seq.kv_len += 1
            seq.last_token = tok
            seq.decode_input_embeds = None
            self._maybe_finish(seq, tok)

    def _maybe_finish(self, seq: Sequence, tok: int):
        eos = not seq.ignore_eos and tok == self.eos
        over = seq.max_frames and seq.frames_emitted + 1 >= seq.max_frames
        # Caller-driven (request-tracked) sequences finish only on EOS
        # (talker_llm_engine.py:74-77); bounded ones also on max_frames.
        if eos or (seq.request_id is None and over):
            self.finish(seq)

    def finish(self, seq: Sequence):
        seq.status = SequenceStatus.FINISHED
        if seq.request_id is not None:
            self.request_id_to_seq.pop(seq.request_id, None)
        self.bm_for(seq).deallocate(seq.block_table)
        if seq in self.running:
            self.running.remove(seq)
