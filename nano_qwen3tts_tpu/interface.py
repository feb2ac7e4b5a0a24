"""Qwen3TTSInterface: high-level orchestrator for the three product modes.

Parity surface with reference interface.py:225-1366 — CustomVoice,
VoiceDesign, VoiceClone (x-vector and ICL), voice-clone prompt creation,
async frame generators — re-architected for the single-process TPU engine:

* ``start()`` spins up the in-process engine loop; there are no worker
  processes, ZMQ sockets, memory-split planning (interface.py:57-197) or
  per-process CUDA memory caps to manage.
* The per-frame orchestration loop (interface.py:1184-1308: await talker
  token -> build predictor prefill -> await predictor burst -> sum embeds ->
  feed talker) lives INSIDE the engine's fused device step; this class only
  prepares prompts and consumes frames.
* Sync generators work (the reference's raise RuntimeError,
  interface.py:753,1122,1174) — useful for offline batch synthesis.
"""

from __future__ import annotations

import base64
import io
import logging
import uuid
from typing import Any, AsyncGenerator, Dict, List, Optional, Tuple, Union

import numpy as np

from nano_qwen3tts_tpu.config import EngineConfig, Qwen3TTSConfig
from nano_qwen3tts_tpu.engine.engine import TTSEngine
from nano_qwen3tts_tpu.utils.generation import (
    EmbeddingTables,
    prepare_inputs,
)
from nano_qwen3tts_tpu.utils.prompt import (
    build_ref_text,
    prepare_custom_voice_prompt,
)

logger = logging.getLogger(__name__)

TALKER_TEMPERATURE = 1.0  # interface.py:1195
PREDICTOR_TEMPERATURE = 0.9  # interface.py:1196


class Qwen3TTSInterface:
    def __init__(
        self,
        model_path: Optional[str] = None,
        *,
        engine_config: Optional[EngineConfig] = None,
        model_config: Optional[Qwen3TTSConfig] = None,
        talker_params: Optional[dict] = None,
        predictor_params: Optional[dict] = None,
        tokenizer=None,  # Callable[[str], np.ndarray [1, L]]
        speech_tokenizer=None,  # audio.codec.SpeechTokenizer
        speaker_encoder=None,  # audio.speaker.SpeakerEncoder
        dtype=None,
    ):
        self.model_path = model_path
        if model_path is not None and (talker_params is None or model_config is None):
            from nano_qwen3tts_tpu.models.weights import load_models

            model_config = model_config or Qwen3TTSConfig.from_pretrained(model_path)
            talker_params, predictor_params = load_models(
                model_path, model_config, dtype=dtype or "bfloat16"
            )
        assert model_config is not None and talker_params is not None
        self.model_config = model_config
        self.engine_config = engine_config or EngineConfig(model=model_path or "")
        self.tables = EmbeddingTables.from_params(talker_params, predictor_params)
        tts_pad = self.tables.text_proj_emb([[model_config.tts_pad_token_id]])[0, 0]
        self.engine = TTSEngine(
            self.engine_config,
            model_config,
            talker_params,
            predictor_params,
            tts_pad_embed=tts_pad,
        )
        if tokenizer is None and model_path is not None:
            from nano_qwen3tts_tpu.utils.prompt import Tokenizer

            tokenizer = Tokenizer(model_path)
        self.tokenize = tokenizer
        self.speech_tokenizer = speech_tokenizer
        self.speaker_encoder = speaker_encoder
        self._model_size = (model_config.tts_model_size or "1.7b").lower()

    @classmethod
    def from_pretrained(cls, model_path: str, **kw) -> "Qwen3TTSInterface":
        """Load from a checkpoint directory.

        The reference resolves HF-hub ids by downloading a snapshot
        (interface.py:226-336); this is a zero-egress build, so hub ids
        fail fast with instructions instead of a confusing FileNotFound.
        """
        import os

        if not os.path.isdir(model_path):
            raise ValueError(
                f"{model_path!r} is not a local checkpoint directory. This "
                "is a zero-egress build without HF-hub download support "
                "(reference interface.py:226-336): download the model "
                "manually (e.g. `huggingface-cli download "
                f"{model_path} --local-dir <dir>` on a connected machine) "
                "and pass the local path."
            )
        from nano_qwen3tts_tpu.audio.codec import load_codec

        inst = cls(model_path=model_path, **kw)
        if inst.speech_tokenizer is None:
            inst.speech_tokenizer = load_codec(model_path)
        if inst.speaker_encoder is None:
            # voice clone needs real ECAPA weights; load when present
            # (speaker.safetensors via tools/convert_checkpoint.py, or
            # speaker_encoder.* embedded in model.safetensors)
            from nano_qwen3tts_tpu.audio.speaker import load_speaker_encoder

            try:
                inst.speaker_encoder = load_speaker_encoder(
                    model_path, inst.model_config.speaker_encoder_config
                )
            except ValueError:
                pass  # clone via precomputed prompts still works
        return inst

    # ------------------------------------------------------------------
    # lifecycle (parity: start_zmq_tasks/stop_zmq_tasks,
    # interface.py:1081-1119 — no processes to spawn here)
    # ------------------------------------------------------------------

    async def start(self):
        await self.engine.start()

    async def stop(self):
        await self.engine.stop()

    def warmup(self, **kw):
        self.engine.runner.warmup(**kw)
        # the codec's streaming-window decode programs are part of the
        # serving hot path too (server/app.DecodeWorker)
        if self.speech_tokenizer is not None and hasattr(
            self.speech_tokenizer, "warmup"
        ):
            self.speech_tokenizer.warmup()

    # ------------------------------------------------------------------
    # audio input normalization (interface.py:483-556)
    # ------------------------------------------------------------------

    @staticmethod
    def _is_probably_base64(x: str) -> bool:
        try:
            if isinstance(x, str) and len(x) > 100:
                base64.b64decode(x.split(",")[-1] if "," in x else x)
                return True
        except Exception:
            pass
        return False

    def _normalize_audio_inputs(
        self, audios: Union[Any, List[Any]]
    ) -> List[Tuple[np.ndarray, int]]:
        from nano_qwen3tts_tpu.audio.wav import read_wav, wav_bytes_to_float

        items = audios if isinstance(audios, list) else [audios]
        out = []
        for item in items:
            if isinstance(item, str):
                if self._is_probably_base64(item):
                    b64 = item.split(",", 1)[1] if item.strip().startswith("data:") else item
                    wav, sr = wav_bytes_to_float(base64.b64decode(b64))
                else:
                    wav, sr = read_wav(item)
                out.append((wav.astype(np.float32), int(sr)))
            elif isinstance(item, tuple) and len(item) == 2:
                wav, sr = item
                wav = np.asarray(wav)
                if wav.ndim > 1:
                    wav = wav.mean(axis=-1)
                out.append((wav.astype(np.float32), int(sr)))
            elif isinstance(item, bytes):
                wav, sr = wav_bytes_to_float(item)
                out.append((wav.astype(np.float32), int(sr)))
            else:
                raise ValueError(f"Unsupported audio input type: {type(item)}")
        return out

    # ------------------------------------------------------------------
    # voice clone prompt (interface.py:670-721)
    # ------------------------------------------------------------------

    def extract_speaker_embedding(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """x-vector from reference audio (reference interface.py:558-589,
        always real ECAPA weights). Refuses to run without them: a
        random-init encoder would return garbage embeddings that clone a
        nonexistent voice with no error signal."""
        assert sr == 24000, "Only support 24kHz audio"
        if self.speaker_encoder is None:
            raise ValueError(
                "no speaker-encoder weights loaded: voice clone x-vectors "
                "need real ECAPA weights. Convert them with "
                "`python tools/convert_checkpoint.py --speaker <ckpt> "
                f"--out {self.model_path or '<model_dir>'}/speaker.safetensors` "
                "(or embed speaker_encoder.* in model.safetensors), or pass "
                "a precomputed voice-clone prompt instead."
            )
        return self.speaker_encoder.extract(audio, sr)

    def create_voice_clone_prompt(
        self,
        ref_audio: Any,
        ref_text: Optional[str] = None,
        x_vector_only_mode: bool = False,
    ) -> Dict[str, Any]:
        if self.speech_tokenizer is None:
            raise RuntimeError("speech_tokenizer not available")
        if not x_vector_only_mode and not ref_text:
            raise ValueError("ref_text is required when x_vector_only_mode=False")
        wav, sr = self._normalize_audio_inputs([ref_audio])[0]
        ref_code = self.speech_tokenizer.encode(wav, sr=sr)  # [T, 16]
        from nano_qwen3tts_tpu.audio.wav import resample

        wav24 = resample(wav, sr, 24000)
        spk_emb = self.extract_speaker_embedding(wav24, 24000)
        return {
            "ref_code": None if x_vector_only_mode else ref_code,
            "ref_spk_embedding": spk_emb,
            "x_vector_only_mode": bool(x_vector_only_mode),
            "icl_mode": bool(not x_vector_only_mode),
            "ref_text": ref_text,
        }

    # ------------------------------------------------------------------
    # prompt prep per mode
    # ------------------------------------------------------------------

    def _prep_custom_voice(self, text: str, language: str, speaker: str):
        input_ids, instruct_ids, speakers, languages = prepare_custom_voice_prompt(
            text=text, speaker=speaker, language=language,
            model_size=self._model_size, tokenize=self.tokenize,
        )
        return prepare_inputs(
            self.model_config, input_ids, instruct_ids=instruct_ids,
            speakers=speakers, languages=languages, non_streaming_mode=True,
            tables=self.tables,
        )

    def _prep_voice_design(self, text: str, instruct: str, language: str):
        input_ids, instruct_ids, _, languages = prepare_custom_voice_prompt(
            text=[text], speaker=[""], language=[language], instruct=[instruct],
            model_size=self._model_size, tokenize=self.tokenize,
        )
        return prepare_inputs(
            self.model_config, input_ids, instruct_ids=instruct_ids,
            speakers=None, languages=languages, non_streaming_mode=True,
            tables=self.tables,
        )

    def _prep_voice_clone(
        self,
        text: str,
        language: str,
        voice_clone_prompt: Dict[str, Any],
        ref_text: Optional[str],
        non_streaming_mode: bool,
    ):
        from nano_qwen3tts_tpu.utils.prompt import build_assistant_text

        icl = voice_clone_prompt.get("icl_mode", False)
        if icl:
            ref_text_final = ref_text or voice_clone_prompt.get("ref_text")
            if not ref_text_final:
                raise ValueError("ICL mode requires ref_text")
        else:
            ref_text_final = None
        input_ids = [self.tokenize(build_assistant_text(text))]
        ref_ids = (
            [self.tokenize(build_ref_text(ref_text_final))] if ref_text_final else None
        )
        vc = {
            "ref_code": [voice_clone_prompt["ref_code"]],
            "ref_spk_embedding": [voice_clone_prompt["ref_spk_embedding"]],
            "x_vector_only_mode": [voice_clone_prompt["x_vector_only_mode"]],
            "icl_mode": [voice_clone_prompt["icl_mode"]],
        }
        return prepare_inputs(
            self.model_config, input_ids, ref_ids=ref_ids, voice_clone_prompt=vc,
            languages=[language], non_streaming_mode=non_streaming_mode,
            tables=self.tables,
        )

    # ------------------------------------------------------------------
    # generation — async (hot path) and sync (offline)
    # ------------------------------------------------------------------

    async def generate_async(
        self,
        inputs_embeds: np.ndarray,
        trailing_text_hiddens: np.ndarray,
        tts_pad_embed=None,  # accepted for API parity; pad handling is
        # engine-internal (trail pool padding)
        talker_attention_mask=None,  # parity arg; engine buckets instead
        request_id: Optional[str] = None,
        max_frames: int = 0,
        stream_info: Optional[dict] = None,
    ) -> AsyncGenerator[List[int], None]:
        async for frame in self.engine.generate_async(
            inputs_embeds, trailing_text_hiddens, request_id=request_id,
            max_frames=max_frames, stream_info=stream_info,
            talker_temperature=TALKER_TEMPERATURE,
            predictor_temperature=PREDICTOR_TEMPERATURE,
        ):
            yield frame

    async def generate_custom_voice_async(
        self, text: str, language: str = "English", speaker: str = "Vivian",
        max_frames: int = 0, stream_info: Optional[dict] = None,
    ):
        embeds, trailing, _ = self._prep_custom_voice(text, language, speaker)
        async for f in self.generate_async(
            embeds[0], trailing[0], max_frames=max_frames,
            stream_info=stream_info,
        ):
            yield f

    async def generate_voice_design_async(
        self, text: str, instruct: str, language: Optional[str] = None,
        max_frames: int = 0, stream_info: Optional[dict] = None,
    ):
        embeds, trailing, _ = self._prep_voice_design(
            text, instruct, language or "Auto"
        )
        async for f in self.generate_async(
            embeds[0], trailing[0], max_frames=max_frames,
            stream_info=stream_info,
        ):
            yield f

    async def generate_voice_clone_async(
        self,
        text: str,
        language: Optional[str] = None,
        ref_audio: Optional[Any] = None,
        ref_text: Optional[str] = None,
        x_vector_only_mode: bool = False,
        voice_clone_prompt: Optional[Dict[str, Any]] = None,
        non_streaming_mode: bool = True,
        max_frames: int = 0,
        stream_info: Optional[dict] = None,
    ):
        if voice_clone_prompt is None:
            if ref_audio is None:
                raise ValueError(
                    "Either `voice_clone_prompt` or `ref_audio` must be provided."
                )
            voice_clone_prompt = self.create_voice_clone_prompt(
                ref_audio, ref_text, x_vector_only_mode
            )
        embeds, trailing, _ = self._prep_voice_clone(
            text, language or "Auto", voice_clone_prompt, ref_text,
            non_streaming_mode,
        )
        async for f in self.generate_async(
            embeds[0], trailing[0], max_frames=max_frames,
            stream_info=stream_info,
        ):
            yield f

    # sync variants (offline/batch; engine's blocking step loop)

    def generate_custom_voice(
        self, text: str, language: str = "English", speaker: str = "Vivian",
        max_frames: int = 0,
    ):
        embeds, trailing, _ = self._prep_custom_voice(text, language, speaker)
        yield from self.engine.generate(
            embeds[0], trailing[0], max_frames=max_frames,
            talker_temperature=TALKER_TEMPERATURE,
            predictor_temperature=PREDICTOR_TEMPERATURE,
        )

    def generate_voice_design(
        self, text: str, instruct: str, language: Optional[str] = None,
        max_frames: int = 0,
    ):
        embeds, trailing, _ = self._prep_voice_design(text, instruct, language or "Auto")
        yield from self.engine.generate(
            embeds[0], trailing[0], max_frames=max_frames,
            talker_temperature=TALKER_TEMPERATURE,
            predictor_temperature=PREDICTOR_TEMPERATURE,
        )

    def generate_voice_clone(
        self,
        text: str,
        language: Optional[str] = None,
        ref_audio: Optional[Any] = None,
        ref_text: Optional[str] = None,
        x_vector_only_mode: bool = False,
        voice_clone_prompt: Optional[Dict[str, Any]] = None,
        non_streaming_mode: bool = True,
        max_frames: int = 0,
    ):
        if voice_clone_prompt is None:
            if ref_audio is None:
                raise ValueError(
                    "Either `voice_clone_prompt` or `ref_audio` must be provided."
                )
            voice_clone_prompt = self.create_voice_clone_prompt(
                ref_audio, ref_text, x_vector_only_mode
            )
        embeds, trailing, _ = self._prep_voice_clone(
            text, language or "Auto", voice_clone_prompt, ref_text, non_streaming_mode
        )
        yield from self.engine.generate(
            embeds[0], trailing[0], max_frames=max_frames,
            talker_temperature=TALKER_TEMPERATURE,
            predictor_temperature=PREDICTOR_TEMPERATURE,
        )

    # ------------------------------------------------------------------

    def codes_to_audio(self, codebook_ids_list: List[List[int]]):
        """Frames -> waveform (interface.py:642-668)."""
        if self.speech_tokenizer is None:
            raise RuntimeError("speech_tokenizer not available")
        if not codebook_ids_list:
            return [], self.speech_tokenizer.sample_rate
        return self.speech_tokenizer.decode(codebook_ids_list)

    def shutdown(self):
        """Release engine resources (interface.py:399-419)."""
        self.engine = None
