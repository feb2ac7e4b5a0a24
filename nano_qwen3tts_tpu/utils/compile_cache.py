"""Stable, persistent XLA compile caching for the serving engine.

Two things make JAX's persistent compile cache actually work for a serving
deployment on TPU:

1. **Persist everything.** The default min-compile-time threshold skips
   small programs, but on a remote-attached TPU every compile pays a full
   relay round trip — persist all of them (`min_compile_time_secs = 0`).

2. **Stable cache keys across entry points.** The cache key hashes the
   StableHLO module with debug info stripped — but Pallas/Mosaic kernels
   ride inside `stablehlo.custom_call` ops whose ``backend_config`` is an
   *opaque serialized MLIR payload*, and that payload embeds the full
   Python traceback of the trace site (``loc(callsite(...))`` chains all
   the way up to the user's top-level script). The outer strip-debuginfo
   pass cannot see into it, so **any program containing a Pallas kernel
   gets a different cache key for every distinct calling script** — a
   fresh driver/server/notebook recompiles every burst-kernel program
   from scratch (measured: ~25 s local compile + minutes of remote-relay
   stall per program; the round-1 driver bench timed out exactly this
   way). Limiting traceback frames in locations to zero removes the
   caller-dependent frames from the Mosaic payload and makes the key a
   pure function of the computation.

Called by ``TTSEngine`` at construction (opt out with
``NANO_TTS_NO_COMPILE_CACHE=1``); safe to call multiple times.
"""

from __future__ import annotations

import logging
import os
import tempfile

logger = logging.getLogger(__name__)

_APPLIED = False


def default_cache_dir() -> str:
    """Per-user cache directory (world-shared /tmp paths would let another
    local user pre-plant deserialized-executable cache entries)."""
    return os.path.join(tempfile.gettempdir(), f"jax_cache_{os.getuid()}")


def enable_stable_compile_cache(cache_dir: str | None = None) -> None:
    """Configure the persistent compile cache with entry-point-stable keys."""
    global _APPLIED
    if os.environ.get("NANO_TTS_NO_COMPILE_CACHE") == "1":
        return
    if _APPLIED:
        return
    import jax

    # Stable keys FIRST, in their own try: strip caller frames from MLIR
    # locations so Mosaic kernel payloads (and with them the whole program's
    # cache key) do not depend on which script traced the program. Verified:
    # identical engine code warmed from script A then run from script B goes
    # from a ~25 s recompile per burst program to a ~1 s cache hit. If a
    # (older) jax lacks these flags, do NOT enable the persistent cache —
    # entry-point-unstable keys make it a recompile-per-script trap.
    try:
        jax.config.update("jax_include_full_tracebacks_in_locations", False)
        jax.config.update("jax_traceback_in_locations_limit", 0)
    except Exception:  # pragma: no cover - older jax without these flags
        logger.warning(
            "jax lacks traceback-location flags; persistent compile cache "
            "left disabled (keys would be entry-point-dependent)"
        )
        _APPLIED = True
        return
    try:
        # Respect a user-configured cache dir (jax config or the standard
        # JAX_COMPILATION_CACHE_DIR env var, which jax reads itself).
        already = jax.config.jax_compilation_cache_dir or os.environ.get(
            "JAX_COMPILATION_CACHE_DIR"
        )
        if not already:
            jax.config.update(
                "jax_compilation_cache_dir",
                cache_dir
                or os.environ.get("JAX_CACHE_DIR", default_cache_dir()),
            )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover
        pass
    _APPLIED = True
