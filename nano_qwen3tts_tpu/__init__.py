"""TPU-native serving engine for Qwen3-TTS.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
tsdocode/nano-qwen3tts-vllm: two-stage TTS pipeline (talker LLM + code
predictor), continuous batching with a paged KV cache, bucketed-jit decode
steps (replacing CUDA graphs), tensor parallelism over a device mesh
(replacing NCCL), and a streaming-PCM server — in one process per host
(replacing the ZMQ multiprocess worker architecture).
"""

from nano_qwen3tts_tpu.config import (
    CodePredictorConfig,
    EngineConfig,
    Qwen3TTSConfig,
    SpeakerEncoderConfig,
    TalkerConfig,
    preset_config,
)
from nano_qwen3tts_tpu.sampling import SamplingParams

__version__ = "0.1.0"

__all__ = [
    "CodePredictorConfig",
    "EngineConfig",
    "Qwen3TTSConfig",
    "SpeakerEncoderConfig",
    "TalkerConfig",
    "SamplingParams",
    "preset_config",
]
