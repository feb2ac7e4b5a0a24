"""Paged KV-cache block bookkeeping (host side).

Parity with reference engine/block_manager.py:29-115: free/used block ids,
ref-counted blocks, hash-based prefix caching. As in the reference, prefix
caching is effectively inert for TTS because prompts are embedding sequences
(no token ids to hash — block_manager.py:68 never fires); the machinery is
kept so token-id workloads can reuse it, and because eviction/ref-counting is
load-bearing either way.

Block id 0 is reserved as the *garbage block*: padded lanes in a bucketed
decode batch write their (masked, meaningless) KV there so the fused frame
step never needs data-dependent control flow. This replaces the reference's
``slot_mapping.fill_(-1)`` + Triton masked-store trick
(layers/attention.py:23-26, model runners' graph replay paths).

A C++ implementation of this allocator (native/engine_core) can be swapped in
via ``nano_qwen3tts_tpu.engine.native_bridge`` for large block counts; the
Python version is authoritative for semantics.
"""

from __future__ import annotations

from collections import deque
from typing import Optional

try:  # same optional dependency as the reference (xxhash C extension)
    import xxhash

    def _hash_tokens(token_ids: list[int], prefix: int = -1) -> int:
        h = xxhash.xxh64()
        if prefix != -1:
            h.update(prefix.to_bytes(8, "little"))  # xxh64 digest, unsigned
        for t in token_ids:
            h.update(int(t).to_bytes(8, "little", signed=True))
        return h.intdigest()

except ImportError:  # pragma: no cover

    def _hash_tokens(token_ids: list[int], prefix: int = -1) -> int:
        return hash((prefix, tuple(token_ids)))


GARBAGE_BLOCK = 0


class Block:
    __slots__ = ("block_id", "ref_count", "hash", "token_ids")

    def __init__(self, block_id: int):
        self.block_id = block_id
        self.ref_count = 0
        self.hash = -1
        self.token_ids: list[int] = []

    def update(self, h: int, token_ids: list[int]):
        self.hash = h
        self.token_ids = token_ids

    def reset(self):
        self.ref_count = 1
        self.hash = -1
        self.token_ids = []


class BlockManager:
    def __init__(self, num_blocks: int, block_size: int):
        assert num_blocks > 1
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.blocks: list[Block] = [Block(i) for i in range(num_blocks)]
        self.hash_to_block_id: dict[int, int] = {}
        # Block 0 reserved as garbage block for padded decode lanes.
        self.free_block_ids: deque[int] = deque(range(1, num_blocks))
        self.used_block_ids: set[int] = set()

    # -- low-level ----------------------------------------------------------

    def _allocate_block(self, block_id: int) -> Block:
        block = self.blocks[block_id]
        assert block.ref_count == 0
        block.reset()
        self.free_block_ids.remove(block_id)
        self.used_block_ids.add(block_id)
        return block

    def _deallocate_block(self, block_id: int):
        assert self.blocks[block_id].ref_count == 0
        self.used_block_ids.remove(block_id)
        self.free_block_ids.append(block_id)

    @property
    def num_free_blocks(self) -> int:
        return len(self.free_block_ids)

    # -- sequence-level API -------------------------------------------------

    def can_allocate(self, num_blocks_needed: int) -> bool:
        return num_blocks_needed <= self.num_free_blocks

    def allocate_prefill(
        self, num_tokens: int, token_ids: Optional[list[int]] = None
    ) -> tuple[list[int], int]:
        """Allocate blocks for an ``num_tokens``-long prefill.

        Returns (block_table, num_cached_tokens). With ``token_ids`` given,
        full blocks are prefix-cache matched by rolling hash (reference
        block_manager.py:62-85); embedding prompts pass None and always get
        fresh blocks.
        """
        n_blocks = -(-num_tokens // self.block_size)
        assert self.can_allocate(n_blocks)
        block_table: list[int] = []
        num_cached = 0
        h = -1
        cache_miss = False
        for i in range(n_blocks):
            start, end = i * self.block_size, min((i + 1) * self.block_size, num_tokens)
            chunk = token_ids[start:end] if token_ids is not None else None
            full = chunk is not None and len(chunk) == self.block_size
            h = _hash_tokens(chunk, h) if full else -1
            block_id = self.hash_to_block_id.get(h, -1) if full else -1
            if block_id == -1 or self.blocks[block_id].token_ids != (chunk or []):
                cache_miss = True
            if full and not cache_miss and block_id != -1:
                num_cached += self.block_size
                if block_id in self.used_block_ids:
                    self.blocks[block_id].ref_count += 1
                else:
                    self._allocate_block(block_id)
            else:
                block_id = self.free_block_ids[0]
                block = self._allocate_block(block_id)
                if full:
                    block.update(h, list(chunk))
                    self.hash_to_block_id[h] = block_id
            block_table.append(block_id)
        return block_table, num_cached

    def can_append(self, kv_len: int, block_table: list[int]) -> bool:
        """True if a decode step writing at slot ``kv_len`` can proceed."""
        needs_block = kv_len % self.block_size == 0 and kv_len // self.block_size >= len(
            block_table
        )
        return (not needs_block) or self.num_free_blocks >= 1

    def may_append(self, kv_len: int, block_table: list[int]):
        """Allocate a new block if the next write crosses a block boundary.

        Mirrors reference may_append (block_manager.py:96-115) with my
        kv_len convention.
        """
        if kv_len % self.block_size == 0 and kv_len // self.block_size >= len(
            block_table
        ):
            block_id = self.free_block_ids[0]
            self._allocate_block(block_id)
            block_table.append(block_id)

    def deallocate(self, block_table: list[int]):
        for block_id in reversed(block_table):
            block = self.blocks[block_id]
            block.ref_count -= 1
            if block.ref_count == 0:
                self._deallocate_block(block_id)
        block_table.clear()
