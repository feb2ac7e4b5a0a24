"""Streaming-PCM HTTP server.

Parity surface with reference examples/server.py (770 LoC, FastAPI):

  POST /v1/audio/speech   -> chunked 16-bit PCM @ 24 kHz
  GET  /voices            -> built-in speakers + registered clone voices
  GET  /health            -> liveness

FastAPI/uvicorn are not available in this environment, so this is a small
asyncio HTTP/1.1 implementation (chunked transfer encoding) with the same
streaming policy:

* 50 ms leading silence flushed immediately (server.py:42-51,563-565);
* the first FIRST_CHUNK_COUNT audio chunks cover FIRST_CHUNK_SIZE codec
  frames each, later chunks STREAMING_CHUNK_SIZE frames (server.py:54-62,
  613-628);
* each chunk decodes a window with STREAMING_CONTEXT_SIZE left-context
  frames that are trimmed after decode (server.py:645-698);
* voice-clone requests prepend up to VOICE_CLONE_CODE_PREFIX_FRAMES
  reference-code frames to the decode context and skip their samples
  (server.py:519-538,657-681);
* decode requests from concurrent streams are micro-batched by a single
  decode worker (server.py:372-465);
* volume scaling + resample + PCM16 (server.py:338-361);
* cancellation safety: client disconnect cancels the producer and clears
  the engine request (server.py:548-556,700-732);
* startup warmup ramp compiles the serving buckets (server.py:253-277).

Environment variables honored (same names as the reference, server.py:39-62):
QWEN3_TTS_MODEL_PATH, STREAMING_CHUNK_SIZE, STREAMING_CONTEXT_SIZE,
FIRST_CHUNK_COUNT, FIRST_CHUNK_SIZE, STREAM_LEADING_SILENCE_MS,
VOICE_CLONE_CODE_PREFIX_FRAMES, PREFILL_COLLECT_MS, DEBUG_SAVE_AUDIO,
HOST, PORT.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import pickle
import time
import uuid
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

logger = logging.getLogger("qwen3tts.server")


@dataclass
class StreamSettings:
    chunk_size: int = int(os.environ.get("STREAMING_CHUNK_SIZE", "4"))
    context_size: int = int(os.environ.get("STREAMING_CONTEXT_SIZE", "8"))
    first_chunk_count: int = int(os.environ.get("FIRST_CHUNK_COUNT", "8"))
    first_chunk_size: int = int(os.environ.get("FIRST_CHUNK_SIZE", "4"))
    leading_silence_ms: int = int(os.environ.get("STREAM_LEADING_SILENCE_MS", "50"))
    clone_prefix_frames: int = int(
        os.environ.get("VOICE_CLONE_CODE_PREFIX_FRAMES", "16")
    )
    volume: float = float(os.environ.get("STREAM_VOLUME", "1.0"))
    sample_rate: int = 24000


def stream_window_combos(s: "StreamSettings") -> set:
    """The (window_frames, context_frames, new_frames) shapes the chunking
    policy produces for FULL chunks (final partial chunks go through the
    classic bucketed path). Used to pre-compile and gate the pooled
    on-device window decode."""
    combos = set()
    emitted = 0
    for chunk_no in range(s.first_chunk_count + 3):
        target = s.first_chunk_size if chunk_no < s.first_chunk_count else s.chunk_size
        upto = emitted + target
        ctx_start = max(0, emitted - s.context_size)
        combos.add((upto - ctx_start, emitted - ctx_start, target))
        emitted = upto
    return combos


class DecodeWorker:
    """Micro-batches codec decode calls from concurrent streams
    (server.py:372-465). Jobs with identical window length decode as one
    batched codec call.

    Two job kinds share the queue:

    * classic: the caller provides the window's codes; one H2D upload +
      decode + fetch per same-length group (the reference's shape).
    * pooled: the codes already live in the engine's device-resident
      codes pool (engine/runner.py codes_pool) — the job is just
      (slot, start) coordinates. ALL streams whose chunks share a window
      shape ride ONE dispatch + ONE trimmed PCM fetch, with zero code
      uploads; through a high-latency host<->device link this collapses
      the per-chunk crossing count from O(streams) to O(1)."""

    def __init__(self, speech_tokenizer, collect_ms: Optional[float] = None):
        self.codec = speech_tokenizer
        if collect_ms is None:
            # under many CCU, a longer window lets all live streams' chunks
            # ride one batched codec call (reference: decode micro-batching,
            # server.py:372-465). The engine loop emits every live stream's
            # frames from ONE fetch, so same-cycle chunk jobs arrive within
            # one event-loop tick — 4 ms merges them without taxing
            # inner-chunk latency the way the old 8 ms did.
            collect_ms = float(os.environ.get("DECODER_COLLECT_MS", "4"))
        self.collect_s = collect_ms / 1e3
        self.queue: asyncio.Queue = asyncio.Queue()
        self._task: Optional[asyncio.Task] = None

    async def start(self):
        if self._task is None:
            self._task = asyncio.create_task(self._loop())

    async def stop(self):
        if self._task:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None

    async def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes [T, 16] -> wav float32 (full window, caller trims)."""
        fut = asyncio.get_running_loop().create_future()
        await self.queue.put(("codes", codes, fut))
        return await fut

    async def decode_pooled(
        self, runner, slot: int, start: int, T: int, ctx: int, new: int
    ) -> np.ndarray:
        """Pooled window decode -> int16 PCM of exactly the new frames."""
        fut = asyncio.get_running_loop().create_future()
        await self.queue.put(("pool", (runner, slot, start, T, ctx, new), fut))
        return await fut

    def _run_pooled_groups(self, by_combo: dict):
        """Device-thread half of the pooled path: one dispatch per window
        shape; returns [(dev_pcm, group)] for the fetch thread."""
        dispatched = []
        for (T, ctx, new), group in by_combo.items():
            runner = group[0][0][0]
            dispatched.append((
                self.codec.dispatch_pool_pcm16(
                    runner.codes_pool,
                    [j[1] for j, _ in group],
                    [j[2] for j, _ in group],
                    T, ctx, new,
                ),
                group,
            ))
        return dispatched

    async def _loop(self):
        while True:
            kind, payload, fut = await self.queue.get()
            jobs = [(kind, payload, fut)]
            deadline = time.monotonic() + self.collect_s
            while True:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    jobs.append(await asyncio.wait_for(self.queue.get(), timeout))
                except asyncio.TimeoutError:
                    break
            # group classic jobs by T, pooled jobs by window shape
            by_len: dict[int, list] = {}
            by_combo: dict[tuple, list] = {}
            for kind, payload, f in jobs:
                if kind == "pool":
                    runner, slot, start, T, ctx, new = payload
                    by_combo.setdefault((T, ctx, new), []).append(
                        ((runner, slot, start), f)
                    )
                else:
                    by_len.setdefault(payload.shape[0], []).append((payload, f))
            from nano_qwen3tts_tpu.engine.device_executor import (
                DEVICE_EXECUTOR,
                FETCH_EXECUTOR,
            )

            loop = asyncio.get_running_loop()
            if by_combo:
                try:
                    dispatched = await loop.run_in_executor(
                        DEVICE_EXECUTOR, self._run_pooled_groups, by_combo
                    )
                    for dev, group in dispatched:
                        pcm = await loop.run_in_executor(
                            FETCH_EXECUTOR, np.asarray, dev
                        )
                        for b, (_, f) in enumerate(group):
                            if not f.done():
                                f.set_result(pcm[b])
                except Exception as e:  # pragma: no cover
                    for group in by_combo.values():
                        for _, f in group:
                            if not f.done():
                                f.set_exception(e)
            # dispatch on the device thread (fast enqueue), fetch on the
            # dedicated fetch thread: the blocking device->host transfer
            # (a full round trip on a remote-relay link) must not hold the
            # device thread, or the engine loop stalls behind every decode
            can_split = hasattr(self.codec, "dispatch_pcm16")
            use_pcm16 = hasattr(self.codec, "decode_pcm16")
            for T, group in by_len.items():
                batch = np.stack([c.T for c, _ in group])  # [B, 16, T]
                try:
                    if can_split:
                        dev, n = await loop.run_in_executor(
                            DEVICE_EXECUTOR, self.codec.dispatch_pcm16, batch
                        )
                        pcm = await loop.run_in_executor(
                            FETCH_EXECUTOR, np.asarray, dev
                        )
                        pcms = [pcm[b, :n] for b in range(pcm.shape[0])]
                        for (c, f), w in zip(group, pcms):
                            if not f.done():
                                f.set_result(w)
                    elif use_pcm16:
                        pcms = await loop.run_in_executor(
                            DEVICE_EXECUTOR, self.codec.decode_pcm16, batch
                        )
                        for (c, f), w in zip(group, pcms):
                            if not f.done():
                                f.set_result(w)
                    else:
                        wavs, _ = await loop.run_in_executor(
                            DEVICE_EXECUTOR, self.codec.decode, batch
                        )
                        for (c, f), w in zip(group, wavs):
                            if not f.done():
                                f.set_result(w)
                except Exception as e:  # pragma: no cover
                    for _, f in group:
                        if not f.done():
                            f.set_exception(e)


class VoiceRegistry:
    """Voice-clone prompt registry: <voices_dir>/<name>.pkl
    (server.py:495-516)."""

    def __init__(self, voices_dir: Optional[str]):
        self.voices_dir = voices_dir
        self.voices: dict[str, dict] = {}
        if voices_dir and os.path.isdir(voices_dir):
            for fn in os.listdir(voices_dir):
                if fn.endswith(".pkl"):
                    try:
                        with open(os.path.join(voices_dir, fn), "rb") as f:
                            self.voices[fn[:-4]] = pickle.load(f)
                    except Exception as e:
                        logger.warning("failed loading voice %s: %s", fn, e)

    def register(self, name: str, prompt: dict):
        self.voices[name] = prompt
        if self.voices_dir:
            os.makedirs(self.voices_dir, exist_ok=True)
            with open(os.path.join(self.voices_dir, f"{name}.pkl"), "wb") as f:
                pickle.dump(prompt, f)

    def get(self, name: str) -> Optional[dict]:
        return self.voices.get(name)


class TTSServer:
    def __init__(
        self,
        interface,
        settings: Optional[StreamSettings] = None,
        voices_dir: Optional[str] = None,
    ):
        self.iface = interface
        self.s = settings or StreamSettings()
        self.registry = VoiceRegistry(voices_dir)
        # DECODER_PROC=1: host the codec in a dedicated OS process with its
        # own device context (reference DECODER_MP_WORKER,
        # examples/server.py:171-247) — the isolation option for pinning
        # codec decode to another chip/host. DECODER_PROC_PLATFORM selects
        # the child's JAX platform (e.g. "cpu" to keep the chip for the LM).
        self._decoder_proc = None
        codec_for_worker = interface.speech_tokenizer
        if os.environ.get("DECODER_PROC") == "1":
            from nano_qwen3tts_tpu.server.decoder_proc import DecoderProcess

            self._decoder_proc = DecoderProcess(
                interface.speech_tokenizer,
                platform=os.environ.get("DECODER_PROC_PLATFORM") or None,
            )
            logger.info(
                "codec decode in dedicated process (platform=%s)",
                self._decoder_proc.platform,
            )
            codec_for_worker = self._decoder_proc
        self.decoder = DecodeWorker(codec_for_worker)
        # pooled on-device window decode: needs the codec in-process (same
        # device context as the engine's codes pool) and a single serving
        # shard. SERVER_POOLED_DECODE=0 opts out (classic path only).
        self._pool_combos = stream_window_combos(self.s)
        self._pooled_enabled = (
            self._decoder_proc is None
            and hasattr(codec_for_worker, "dispatch_pool_pcm16")
            and not interface.engine.runner.data_sharded
            and os.environ.get("SERVER_POOLED_DECODE", "1") != "0"
        )
        self._server: Optional[asyncio.AbstractServer] = None
        # DEBUG_SAVE_AUDIO=dir: dump each stream's PCM to a WAV
        # (reference server.py:103-130)
        self.debug_dir = os.environ.get("DEBUG_SAVE_AUDIO") or None

    # ------------------------------------------------------------------
    # stream generation: frames -> PCM chunks
    # ------------------------------------------------------------------

    async def _pcm_chunks(
        self, gen, clone_prefix: Optional[np.ndarray],
        stream_info: Optional[dict] = None,
    ):
        """Consume codec frames, yield PCM16 byte chunks per the reference
        chunking policy.

        When ``stream_info`` carries a pooled-slot handle (the engine's
        device-resident codes pool), full chunks with a warmed window shape
        decode straight from the pool: the codes never cross back to the
        device and only the trimmed PCM crosses to the host. Clone-prefix
        context windows and final partial chunks use the classic
        upload-the-window path (already bucket-warmed)."""
        s = self.s
        lead = np.zeros(int(s.sample_rate * s.leading_silence_ms / 1000), np.float32)
        yield pcm16_bytes(lead)

        hop = self.iface.speech_tokenizer.cfg.hop
        codes: list[list[int]] = []
        if clone_prefix is not None and len(clone_prefix):
            codes.extend([list(f) for f in clone_prefix[-s.clone_prefix_frames :]])
        prefix_len = len(codes)

        emitted = prefix_len  # frames whose audio has been yielded (or skipped)
        chunk_no = 0

        def _pooled_ok(ctx_start: int, T: int, ctxn: int, new: int) -> bool:
            return (
                self._pooled_enabled
                and stream_info is not None
                and stream_info.get("pooled")
                and stream_info.get("held")
                and ctx_start >= prefix_len
                and (T, ctxn, new) in self._pool_combos
            )

        async def flush(upto: int):
            nonlocal emitted, chunk_no
            ctx_start = max(0, emitted - s.context_size)
            T = upto - ctx_start
            ctxn = emitted - ctx_start
            new = upto - emitted
            if _pooled_ok(ctx_start, T, ctxn, new):
                wav = await self.decoder.decode_pooled(
                    self.iface.engine.runner, stream_info["slot"],
                    ctx_start - prefix_len, T, ctxn, new,
                )
            else:
                window = np.asarray(codes[ctx_start:upto], np.int32)  # [T, 16]
                wav = await self.decoder.decode(window)
                wav = wav[ctxn * hop : (ctxn + new) * hop]
            emitted = upto
            chunk_no += 1
            if wav.dtype == np.int16:  # device-side PCM16 path
                if s.volume != 1.0:
                    return pcm16_bytes(wav.astype(np.float32) / 32768.0 * s.volume)
                return wav.astype("<i2").tobytes()
            if s.volume != 1.0:
                wav = wav * s.volume
            return pcm16_bytes(wav)

        async for frame in gen:
            codes.append(frame)
            n_new = len(codes) - emitted
            target = (
                s.first_chunk_size if chunk_no < s.first_chunk_count else s.chunk_size
            )
            if n_new >= target:
                yield await flush(len(codes))
        if len(codes) > emitted:
            yield await flush(len(codes))

    def _build_stream(self, req: dict):
        """Prepare a request: prompt prep + serve-time validation. Raises
        ValueError (mapped to HTTP 400 by _route, BEFORE response headers)
        for prompts the warmed deployment cannot serve without a lazy
        compile stall (engine.validate_prompt_len). Returns
        (embeds, trailing, clone_prefix, stream_kwargs)."""
        mode = req.get("mode")
        voice = req.get("voice", "Vivian")
        text = req.get("input") or req.get("text") or ""
        language = req.get("language", "Auto")
        clone_prefix = None
        if mode == "voice_design" or req.get("instruct"):
            embeds, trailing, _ = self.iface._prep_voice_design(
                text, req.get("instruct", ""), language
            )
        elif self.registry.get(voice) is not None:
            prompt = self.registry.get(voice)
            if prompt.get("ref_code") is not None:
                clone_prefix = np.asarray(prompt["ref_code"])
            embeds, trailing, _ = self.iface._prep_voice_clone(
                text, language, prompt, None,
                bool(req.get("non_streaming_mode", True)),
            )
        else:
            embeds, trailing, _ = self.iface._prep_custom_voice(
                text, language, voice
            )
        self.iface.engine.validate_prompt_len(embeds[0].shape[0])
        return embeds, trailing, clone_prefix

    async def generate_speech_stream(self, req: dict, prepped=None):
        """Yield PCM16 chunks for one request dict (server.py:543-732)."""
        # extension over the reference API: cap generated frames (12.5/s);
        # 0 = run to EOS. Used by load tests for deterministic durations.
        max_frames = int(req.get("max_frames", 0) or 0)
        embeds, trailing, clone_prefix = prepped or self._build_stream(req)
        stream_info: dict = {} if self._pooled_enabled else None
        gen = self.iface.generate_async(
            embeds[0], trailing[0], max_frames=max_frames,
            stream_info=stream_info,
        )
        debug_chunks = [] if self.debug_dir else None
        try:
            async for chunk in self._pcm_chunks(gen, clone_prefix, stream_info):
                if debug_chunks is not None:
                    debug_chunks.append(chunk)
                yield chunk
        finally:
            await gen.aclose()  # cancellation path -> engine.clear_request
            if stream_info:
                # free the codes-pool slot hold AFTER the final window
                # decode (the engine released its own reference at finish)
                self.iface.engine.release_stream_hold(stream_info)
            if debug_chunks:
                try:
                    os.makedirs(self.debug_dir, exist_ok=True)
                    pcm = np.frombuffer(b"".join(debug_chunks), dtype="<i2")
                    from nano_qwen3tts_tpu.audio.wav import write_wav

                    path = os.path.join(
                        self.debug_dir, f"stream_{uuid.uuid4().hex[:8]}.wav"
                    )
                    write_wav(path, pcm.astype(np.float32) / 32768.0, 24000)
                    logger.info("debug audio saved: %s", path)
                except Exception as e:
                    logger.warning("debug audio save failed: %s", e)

    # ------------------------------------------------------------------
    # HTTP plumbing (stdlib asyncio)
    # ------------------------------------------------------------------

    async def _handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        try:
            request_line = await reader.readline()
            if not request_line:
                return
            method, path, _ = request_line.decode().split(" ", 2)
            headers = {}
            while True:
                line = await reader.readline()
                if line in (b"\r\n", b"\n", b""):
                    break
                k, _, v = line.decode().partition(":")
                headers[k.strip().lower()] = v.strip()
            body = b""
            if "content-length" in headers:
                body = await reader.readexactly(int(headers["content-length"]))
            await self._route(method, path, body, writer)
        except (asyncio.IncompleteReadError, ConnectionResetError):
            pass
        except Exception as e:
            logger.exception("request failed: %s", e)
            try:
                await _respond_json(writer, 500, {"error": str(e)})
            except Exception:
                pass
        finally:
            try:
                writer.close()
                await writer.wait_closed()
            except Exception:
                pass

    async def _route(self, method, path, body, writer):
        if method == "GET" and path in ("/", "/ui"):
            # voice-design web UI (reference examples/gradio_voice_design.py)
            from nano_qwen3tts_tpu.server.ui import render_page

            page = render_page().encode()
            writer.write(
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
                b"Content-Length: %d\r\n\r\n" % len(page) + page
            )
            await writer.drain()
        elif method == "GET" and path == "/health":
            stats = dict(getattr(self.iface.engine, "stats", {}))
            await _respond_json(writer, 200, {"status": "ok", "engine": stats})
        elif method == "GET" and path == "/voices":
            builtin = sorted((self.iface.model_config.talker_config.spk_id or {}).keys())
            await _respond_json(
                writer, 200,
                {"voices": builtin, "cloned": sorted(self.registry.voices.keys())},
            )
        elif method == "POST" and path == "/v1/audio/speech":
            req = json.loads(body or b"{}")
            engine = self.iface.engine
            if hasattr(engine, "can_admit") and not engine.can_admit():
                # bounded-queue overload (engine.EngineOverloaded): bursts
                # up to max_num_seqs queue for freed stream slots; past the
                # bound, tell the client to retry instead of streaming an
                # error mid-response
                writer.write(
                    b"HTTP/1.1 503 Service Unavailable\r\n"
                    b"Retry-After: 1\r\nContent-Type: application/json\r\n"
                    b"Content-Length: 24\r\n\r\n"
                    b'{"error": "overloaded"}\n'
                )
                await writer.drain()
                return
            try:
                prepped = self._build_stream(req)
            except ValueError as e:
                # over-bucket / over-length prompt, unknown voice, bad
                # request fields: a clean 4xx BEFORE the streaming headers
                await _respond_json(writer, 400, {"error": str(e)})
                return
            t0 = time.time()
            writer.write(
                b"HTTP/1.1 200 OK\r\n"
                b"Content-Type: audio/pcm;rate=24000\r\n"
                b"Transfer-Encoding: chunked\r\n\r\n"
            )
            await writer.drain()
            n = 0
            try:
                async for chunk in self.generate_speech_stream(req, prepped):
                    writer.write(b"%x\r\n" % len(chunk) + chunk + b"\r\n")
                    await writer.drain()
                    n += 1
                writer.write(b"0\r\n\r\n")
                await writer.drain()
            except (ConnectionResetError, BrokenPipeError):
                logger.info("client disconnected mid-stream")
            except Exception as e:
                # Engine-side failure (e.g. engine.RequestError after
                # persistent step failures, or preemption under block
                # pressure): abort the chunked stream WITHOUT the terminal
                # 0-chunk so the client observes a clean transport error
                # instead of hanging or silently treating a truncated
                # stream as complete.
                logger.error("stream %s aborted after %d chunks: %s",
                             req.get("input", "")[:32], n, e)
                writer.close()
                return
            logger.info(
                "stream done: %d chunks in %.2fs", n, time.time() - t0
            )
        elif method == "POST" and path == "/v1/voices":
            # register a clone voice from base64 WAV (extension endpoint)
            req = json.loads(body or b"{}")
            prompt = self.iface.create_voice_clone_prompt(
                req["ref_audio"], req.get("ref_text"),
                bool(req.get("x_vector_only_mode", False)),
            )
            self.registry.register(req["name"], prompt)
            await _respond_json(writer, 200, {"registered": req["name"]})
        else:
            await _respond_json(writer, 404, {"error": "not found"})

    async def start(self, host="0.0.0.0", port=8000, warmup=True):
        await self.iface.start()
        await self.decoder.start()
        if warmup:
            t0 = time.time()
            from nano_qwen3tts_tpu.engine.device_executor import DEVICE_EXECUTOR

            loop = asyncio.get_running_loop()
            await loop.run_in_executor(DEVICE_EXECUTOR, self.iface.warmup)
            if self._pooled_enabled:
                # pooled window-decode programs for every chunk shape the
                # policy produces, at every batch bucket up to the lane cap
                runner = self.iface.engine.runner
                cap = runner.cfg.max_active_streams
                buckets = [b for b in (1, 2, 4, 8, 16, 32, 64) if b <= cap]
                if not buckets or buckets[-1] < cap:
                    buckets.append(1 << (cap - 1).bit_length())
                await loop.run_in_executor(
                    DEVICE_EXECUTOR,
                    lambda: self.iface.speech_tokenizer.warmup_pool(
                        runner.codes_pool, sorted(self._pool_combos), buckets
                    ),
                )
            logger.info("warmup done in %.1fs", time.time() - t0)
        self._server = await asyncio.start_server(self._handle, host, port)
        logger.info("serving on %s:%d", host, port)

    async def stop(self):
        if self._server:
            self._server.close()
            await self._server.wait_closed()
            self._server = None
        await self.decoder.stop()
        if self._decoder_proc is not None:
            self._decoder_proc.stop()
        await self.iface.stop()

    async def serve_forever(self, host="0.0.0.0", port=8000):
        await self.start(host, port)
        async with self._server:
            await self._server.serve_forever()


def pcm16_bytes(wav: np.ndarray) -> bytes:
    from nano_qwen3tts_tpu.audio.wav import float_to_pcm16

    return float_to_pcm16(wav).tobytes()


async def _respond_json(writer, status, obj):
    body = json.dumps(obj).encode()
    codes = {
        200: b"OK", 400: b"Bad Request", 404: b"Not Found",
        500: b"Internal Server Error", 503: b"Service Unavailable",
    }
    writer.write(
        b"HTTP/1.1 %d %s\r\nContent-Type: application/json\r\n"
        b"Content-Length: %d\r\n\r\n" % (status, codes.get(status, b"?"), len(body))
        + body
    )
    await writer.drain()


def main():  # pragma: no cover
    import argparse

    from nano_qwen3tts_tpu.interface import Qwen3TTSInterface

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=os.environ.get("QWEN3_TTS_MODEL_PATH"))
    ap.add_argument("--host", default=os.environ.get("HOST", "0.0.0.0"))
    ap.add_argument("--port", type=int, default=int(os.environ.get("PORT", "8000")))
    ap.add_argument("--voices-dir", default="voices")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    iface = Qwen3TTSInterface.from_pretrained(args.model)
    server = TTSServer(iface, voices_dir=args.voices_dir)
    asyncio.run(server.serve_forever(args.host, args.port))


if __name__ == "__main__":  # pragma: no cover
    main()
