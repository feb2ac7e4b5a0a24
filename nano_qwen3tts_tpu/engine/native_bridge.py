"""ctypes bridge to the C++ engine core (native/engine_core.cpp).

Provides ``NativeBlockManager`` — a drop-in replacement for the Python
``BlockManager`` hot path (without the token-id prefix cache, which is inert
for embedding prompts; the Python class remains the oracle) — and batched
metadata assembly used by the Runner. Builds the shared library on first use
if the compiler is available; falls back silently otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libengine_core.so")
_lib = None


def load_library(build: bool = True):
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.ec_create.restype = ctypes.c_void_p
    lib.ec_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.ec_destroy.argtypes = [ctypes.c_void_p]
    lib.ec_num_free.restype = ctypes.c_int32
    lib.ec_num_free.argtypes = [ctypes.c_void_p]
    lib.ec_allocate_prefill.restype = ctypes.c_int32
    lib.ec_allocate_prefill.argtypes = [ctypes.c_void_p, ctypes.c_int32, i32p]
    lib.ec_can_append.restype = ctypes.c_int32
    lib.ec_can_append.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
    lib.ec_may_append.restype = ctypes.c_int32
    lib.ec_may_append.argtypes = [ctypes.c_void_p, ctypes.c_int32, i32p, ctypes.c_int32]
    lib.ec_deallocate.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int32]
    lib.ec_prefill_slots.argtypes = [i32p, ctypes.c_int32, ctypes.c_int32, i32p]
    lib.ec_decode_metadata.argtypes = [
        i32p, i32p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p,
    ]
    _lib = lib
    return lib


def _as_i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


class NativeBlockManager:
    """API-compatible subset of engine/block_manager.BlockManager backed by
    the C++ allocator. Python lists in/out so the Scheduler is agnostic."""

    def __init__(self, num_blocks: int, block_size: int, max_table: int = 1024):
        lib = load_library()
        if lib is None:
            raise RuntimeError("native engine core unavailable")
        self._lib = lib
        self._h = lib.ec_create(num_blocks, block_size)
        assert self._h, "ec_create failed"
        self.num_blocks = num_blocks
        self.block_size = block_size
        self._max_table = max_table
        self._scratch = np.zeros(max_table, np.int32)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.ec_destroy(self._h)
        except Exception:
            pass

    @property
    def num_free_blocks(self) -> int:
        return int(self._lib.ec_num_free(self._h))

    def can_allocate(self, num_blocks_needed: int) -> bool:
        return num_blocks_needed <= self.num_free_blocks

    def allocate_prefill(self, num_tokens: int, token_ids=None):
        n = self._lib.ec_allocate_prefill(self._h, num_tokens, _as_i32p(self._scratch))
        if n < 0:
            raise AssertionError("out of KV blocks")
        return [int(x) for x in self._scratch[:n]], 0

    def can_append(self, kv_len: int, block_table: list[int]) -> bool:
        return bool(self._lib.ec_can_append(self._h, kv_len, len(block_table)))

    def may_append(self, kv_len: int, block_table: list[int]):
        n = len(block_table)
        self._scratch[:n] = block_table
        n2 = self._lib.ec_may_append(self._h, kv_len, _as_i32p(self._scratch), n)
        if n2 < 0:
            raise AssertionError("out of KV blocks")
        if n2 > n:
            block_table.append(int(self._scratch[n2 - 1]))

    def deallocate(self, block_table: list[int]):
        n = len(block_table)
        if n:
            self._scratch[:n] = block_table
            self._lib.ec_deallocate(self._h, _as_i32p(self._scratch), n)
        block_table.clear()


def prefill_slots_native(table: list[int], num_tokens: int, block_size: int):
    lib = load_library()
    t = np.asarray(table, np.int32)
    out = np.zeros(num_tokens, np.int32)
    lib.ec_prefill_slots(_as_i32p(t), num_tokens, block_size, _as_i32p(out))
    return out


def decode_metadata_native(
    kv_lens: np.ndarray, tables: np.ndarray, block_size: int
):
    """kv_lens [B] int32, tables [B, NT] int32 -> (positions, slots, attn_lens)."""
    lib = load_library()
    B, NT = tables.shape
    kv_lens = np.ascontiguousarray(kv_lens, np.int32)
    tables = np.ascontiguousarray(tables, np.int32)
    tl = np.full(B, NT, np.int32)
    pos = np.zeros(B, np.int32)
    slots = np.zeros(B, np.int32)
    attn = np.zeros(B, np.int32)
    lib.ec_decode_metadata(
        _as_i32p(kv_lens), _as_i32p(tables), _as_i32p(tl), B, NT, block_size,
        _as_i32p(pos), _as_i32p(slots), _as_i32p(attn),
    )
    return pos, slots, attn
