"""C++ engine core vs the Python oracle: exact equivalence."""

import numpy as np
import pytest

from nano_qwen3tts_tpu.engine.block_manager import BlockManager
from nano_qwen3tts_tpu.engine.native_bridge import (
    NativeBlockManager,
    decode_metadata_native,
    load_library,
    prefill_slots_native,
)
from nano_qwen3tts_tpu.ops.kv_cache import prefill_slot_mapping

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="native engine core unavailable (no g++)"
)


def test_alloc_parity_with_python():
    py = BlockManager(16, 8)
    nat = NativeBlockManager(16, 8)
    t_py, _ = py.allocate_prefill(20)
    t_nat, _ = nat.allocate_prefill(20)
    assert t_py == t_nat
    assert py.num_free_blocks == nat.num_free_blocks
    py.deallocate(t_py)
    nat.deallocate(t_nat)
    assert py.num_free_blocks == nat.num_free_blocks
    # FIFO order preserved after dealloc
    t_py2, _ = py.allocate_prefill(8)
    t_nat2, _ = nat.allocate_prefill(8)
    assert t_py2 == t_nat2


def test_append_boundary_parity():
    py = BlockManager(8, 4)
    nat = NativeBlockManager(8, 4)
    tp, _ = py.allocate_prefill(4)
    tn, _ = nat.allocate_prefill(4)
    for kv in range(4, 14):
        assert py.can_append(kv, tp) == nat.can_append(kv, tn)
        py.may_append(kv, tp)
        nat.may_append(kv, tn)
        assert tp == tn
    assert py.num_free_blocks == nat.num_free_blocks


def test_exhaustion_behaviour():
    nat = NativeBlockManager(4, 8)  # 3 usable
    t, _ = nat.allocate_prefill(24)
    assert len(t) == 3
    assert nat.num_free_blocks == 0
    assert nat.can_append(20, t)  # within last block
    assert not nat.can_append(24, t)  # needs a 4th block
    with pytest.raises(AssertionError):
        nat.allocate_prefill(8)


def test_prefill_slots_match_python():
    table = [3, 7, 1]
    want = prefill_slot_mapping(table, 40, 16)
    got = prefill_slots_native(table, 40, 16)
    np.testing.assert_array_equal(got, want)


def test_decode_metadata_matches_python():
    bs = 16
    kv_lens = np.array([20, 31, 16], np.int32)
    tables = np.array([[2, 5, 0], [7, 9, 0], [4, 1, 0]], np.int32)
    pos, slots, attn = decode_metadata_native(kv_lens, tables, bs)
    for i in range(3):
        kv = kv_lens[i]
        assert pos[i] == kv + 1  # reference decode off-by-one
        assert slots[i] == tables[i][kv // bs] * bs + kv % bs
        assert attn[i] == kv + 1


def test_stress_random_parity(rng):
    py = BlockManager(64, 8)
    nat = NativeBlockManager(64, 8)
    live = []
    for step in range(300):
        op = rng.integers(0, 3)
        if op == 0 and py.num_free_blocks > 4:
            n = int(rng.integers(1, 30))
            if py.can_allocate(-(-n // 8)):
                tp, _ = py.allocate_prefill(n)
                tn, _ = nat.allocate_prefill(n)
                assert tp == tn
                live.append((tp, tn, n))
        elif op == 1 and live:
            tp, tn, n = live[rng.integers(0, len(live))]
            if py.can_append(n, tp) and nat.can_append(n, tn):
                py.may_append(n, tp)
                nat.may_append(n, tn)
                assert tp == tn
        elif op == 2 and live:
            idx = int(rng.integers(0, len(live)))
            tp, tn, _ = live.pop(idx)
            py.deallocate(tp)
            nat.deallocate(tn)
        assert py.num_free_blocks == nat.num_free_blocks
