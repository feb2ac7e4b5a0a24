"""Per-request talker sequence state.

Parity with reference engine/sequence.py:15-90, adapted for the TPU engine:

* Prompts are *embedding sequences*, never token ids (reference
  sequence.py:22,27 — ``input_embeds`` with ``num_tokens =
  input_embeds.shape[1]``).
* ``decode_input_embeds`` is the caller-fed next-frame embedding that gates
  decode scheduling (reference sequence.py:24, talker_llm_engine.py:35-44).
* The KV/position bookkeeping encodes the reference's decode off-by-one:
  after an L-token prefill, decode step ``f`` writes its KV at slot
  ``L+f-1`` but rotates with RoPE position ``L+f`` (prepare_decode_talker,
  talker_mode_runner.py:116-140: ``positions.append(len(seq))`` while the
  slot comes from ``num_tokens - 1``). We reproduce that exactly:
  ``rope_position == kv_len + 1`` for decode steps.

Only the talker has persistent sequences. The predictor's 17-token run is a
single fused ``lax.scan`` inside the frame step (models/predictor.py), so the
reference's PredictorSequence/PredictorScheduler machinery
(predictor_llm_engine.py, predictor_model_runner.py:25-28) has no host-side
counterpart here — by design.
"""

from __future__ import annotations

from enum import Enum, auto
from itertools import count
from typing import Optional

import numpy as np


class SequenceStatus(Enum):
    WAITING = auto()
    RUNNING = auto()
    FINISHED = auto()


class Sequence:
    counter = count()

    def __init__(
        self,
        input_embeds: np.ndarray,  # [L, D] float prompt embeddings
        *,
        temperature: float = 1.0,
        max_frames: int = 0,  # 0 = unbounded (caller-driven until EOS)
        ignore_eos: bool = False,
        request_id: Optional[str] = None,
        block_size: int = 128,
        seed: int = 0,
    ):
        assert input_embeds.ndim == 2
        self.seq_id = next(Sequence.counter)
        self.request_id = request_id
        self.status = SequenceStatus.WAITING
        self.input_embeds = input_embeds
        self.block_size = block_size
        self.temperature = temperature
        self.max_frames = max_frames
        self.ignore_eos = ignore_eos
        self.seed = seed

        self.prompt_len = int(input_embeds.shape[0])
        # Number of KV entries written so far (prefill writes prompt_len).
        self.kv_len = 0
        # Codec frames yielded so far (== completed decode steps).
        self.frames_emitted = 0
        # Caller-fed next-step embedding ([D] or [1, D]); None = not ready.
        self.decode_input_embeds: Optional[np.ndarray] = None
        self.block_table: list[int] = []
        # Slot in the device-side trailing-text-hidden pool (engine/runner.py).
        self.pool_slot: int = -1
        # Data shard owning this request for its lifetime (data-sharded
        # serving: its KV blocks, pool rows, and decode lane all live in
        # this shard's slice of the device state). 0 when unsharded.
        self.data_shard: int = 0
        self.last_token: Optional[int] = None

    # -- scheduling views ---------------------------------------------------

    @property
    def is_finished(self) -> bool:
        return self.status == SequenceStatus.FINISHED

    @property
    def decode_kv_target(self) -> int:
        """KV entries after the *next* decode step writes (kv_len + 1)."""
        return self.kv_len + 1

    @property
    def num_blocks_needed(self) -> int:
        """Blocks needed to hold the current kv_len entries."""
        return -(-max(self.kv_len, 1) // self.block_size)

    def blocks_for(self, n_tokens: int) -> int:
        return -(-n_tokens // self.block_size)

    @property
    def rope_position(self) -> int:
        """RoPE position for the next decode step (reference quirk: kv_len+1)."""
        return self.kv_len + 1

    @property
    def next_slot(self) -> int:
        """Flat KV slot index for the next decode write."""
        block_idx = self.kv_len // self.block_size
        offset = self.kv_len % self.block_size
        return self.block_table[block_idx] * self.block_size + offset

    def __len__(self) -> int:
        return self.kv_len
