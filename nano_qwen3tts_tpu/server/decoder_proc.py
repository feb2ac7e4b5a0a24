"""Dedicated codec-decoder process.

Parity with the reference's ``DECODER_MP_WORKER`` option
(examples/server.py:171-247): the neural-codec decode runs in its OWN OS
process with its own device context, so (a) codec decode can be pinned to a
different chip/host than the engine, and (b) a slow decode can never stall
the engine's device thread. The in-process micro-batched DecodeWorker
(server/app.py) stays the default — on a single chip the fused scheduling
is faster — this is the isolation option for multi-chip serving.

The child process receives the codec config + (optionally) exact weights at
spawn, then serves ``decode_pcm16`` calls over a Pipe. The parent-side
object duck-types the SpeechTokenizer surface DecodeWorker dispatches on
(``decode_pcm16(batch) -> [int16 pcm]``), so it drops in via the
``DECODER_PROC=1`` env var with zero changes to the streaming policy.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import traceback
from typing import Optional

import numpy as np


def _worker_main(conn, cfg_dict: dict, flat_params: Optional[dict],
                 platform: Optional[str], seed: int):
    try:
        import jax

        if platform:
            # must win over any pre-registered platform before backend init
            jax.config.update("jax_platforms", platform)
        from nano_qwen3tts_tpu.audio.codec import (
            CodecConfig,
            SpeechTokenizer,
            _unflatten,
        )

        cfg = CodecConfig(**cfg_dict)
        params = _unflatten(flat_params, cfg) if flat_params is not None else None
        codec = SpeechTokenizer(cfg, params, seed=seed)
        conn.send(("ready", jax.devices()[0].platform))
        while True:
            msg = conn.recv()
            if msg[0] == "shutdown":
                conn.send(("bye", None))
                return
            if msg[0] == "decode_pcm16":
                try:
                    pcms = codec.decode_pcm16(msg[1])
                    conn.send(("ok", [np.asarray(p) for p in pcms]))
                except Exception:
                    conn.send(("err", traceback.format_exc()))
            else:
                conn.send(("err", f"unknown command {msg[0]!r}"))
    except Exception:
        try:
            conn.send(("fatal", traceback.format_exc()))
        except Exception:
            pass


class DecoderProcess:
    """Parent-side handle. Build from an existing SpeechTokenizer to ship
    its exact weights to the child (bit-identical decode), or from a config
    alone for seeded-random weights."""

    def __init__(
        self,
        speech_tokenizer=None,
        cfg=None,
        platform: Optional[str] = None,
        seed: int = 0,
        start_timeout_s: float = 120.0,
    ):
        from nano_qwen3tts_tpu.audio.codec import flatten_codec_params

        if speech_tokenizer is not None:
            cfg = speech_tokenizer.cfg
            flat = flatten_codec_params(speech_tokenizer.params, cfg)
        else:
            assert cfg is not None, "need a SpeechTokenizer or a CodecConfig"
            flat = None
        self.cfg = cfg
        ctx = mp.get_context("spawn")
        self._conn, child = ctx.Pipe()
        self._proc = ctx.Process(
            target=_worker_main,
            args=(child, dataclasses.asdict(cfg), flat, platform, seed),
            daemon=True,
        )
        self._proc.start()
        child.close()
        if not self._conn.poll(start_timeout_s):
            self.stop()
            raise RuntimeError("decoder process did not become ready")
        kind, payload = self._conn.recv()
        if kind != "ready":
            self.stop()
            raise RuntimeError(f"decoder process failed to start: {payload}")
        self.platform = payload

    # SpeechTokenizer surface DecodeWorker dispatches on (server/app.py):
    # only decode_pcm16 — no dispatch_pcm16, so the worker takes the
    # blocking single-call path, which is correct across a process boundary.
    def decode_pcm16(self, codes) -> list[np.ndarray]:
        self._conn.send(("decode_pcm16", np.asarray(codes)))
        kind, payload = self._conn.recv()
        if kind != "ok":
            raise RuntimeError(f"decoder process error: {payload}")
        return payload

    def stop(self):
        try:
            if self._proc.is_alive():
                try:
                    self._conn.send(("shutdown", None))
                    self._conn.poll(5)
                except Exception:
                    pass
                self._proc.join(timeout=5)
                if self._proc.is_alive():
                    self._proc.terminate()
        finally:
            try:
                self._conn.close()
            except Exception:
                pass
