"""Configuration for the TPU-native Qwen3-TTS engine.

Three layers (mirrors the reference's config system, /root/reference/
nano-qwen3tts-vllm/config.py:41-610, re-designed for a single-process
JAX engine):

  * ``EngineConfig``   — engine/runtime knobs (batching, KV cache, mesh).
  * model config tree  — ``Qwen3TTSConfig`` > ``TalkerConfig`` >
    ``CodePredictorConfig`` + ``SpeakerEncoderConfig``, parsed from the
    checkpoint's ``config.json``.
  * environment variables — server/streaming tuning (see server/app.py).

No torch / transformers dependency: plain dataclasses + dict parsing.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Engine config
# ---------------------------------------------------------------------------


@dataclass
class EngineConfig:
    """Engine/runtime configuration.

    Parity with reference ``Config`` (config.py:41-66) plus TPU-specific
    fields. The reference forces ``max_model_len = 1024`` (config.py:64);
    we keep that default but allow overriding (paged KV makes longer
    sequences a capacity question, not a kernel question).
    """

    model: str = ""
    max_num_batched_tokens: int = 16384
    max_num_seqs: int = 512
    max_model_len: int = 1024
    # Fraction of HBM the talker KV cache may use (reference:
    # gpu_memory_utilization, config.py:47). On TPU both models live in one
    # process so there is no per-process memory-split planner
    # (interface.py:57-197 is obsolete by design).
    hbm_memory_utilization: float = 0.9
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    enforce_eager: bool = False  # disable bucketed-jit warmup (debug only)
    eos: int = 2150  # talker codec EOS (hard-coded in reference interface.py:1233)
    kvcache_block_size: int = 128
    num_kvcache_blocks: int = -1  # -1 = size from free HBM at startup
    # Max concurrent streaming requests resident in the decode pool. Bounds
    # the device-side trailing-text-hidden pool (engine/runner.py).
    max_active_streams: int = 64
    # Batch-size buckets for the fused decode frame step; every live batch is
    # padded up to the next bucket so each bucket compiles exactly once
    # (replaces the reference's CUDA-graph capture families, §2.9 N3).
    decode_buckets: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64)
    # Token buckets for talker prefill (reference captures 256 CUDA graphs,
    # talker_mode_runner.py:194-234; we compile ~6 XLA programs instead).
    prefill_buckets: tuple[int, ...] = (64, 128, 256, 512, 1024)
    # Weight quantization: None | "int8" (w8a8/w8a16 via INT8_MODE) | "fp8"
    # (float8_e4m3fn weight-only; north-star "INT8/FP8 weights")
    quantization: Optional[str] = None
    # Horizontally fuse q/k/v and gate/up into single matmuls at load
    # (the reference's QKVParallelLinear / MergedColumnParallelLinear,
    # layers/linear.py:76-128, realized as a weight transform).
    fuse_matmuls: bool = True
    # KV cache dtype: "bf16" | "int8"
    kv_cache_dtype: str = "bf16"
    # Paged decode attention implementation: "auto" (pallas on TPU, xla
    # elsewhere) | "xla" | "pallas"
    attention_impl: str = "auto"
    # Predictor frame burst implementation: "auto" (Pallas VMEM-resident
    # burst kernel on TPU when the weight layout supports it, else the XLA
    # scan) | "xla" | "pallas"
    predictor_impl: str = "auto"
    # Codec frames produced per decode dispatch (lax.scan over the fused
    # step). 4 matches the server's PCM chunk policy; amortizes per-frame
    # host work and the device->host token fetch.
    frames_per_step: int = 1
    # Pipeline decode dispatches: launch step k+1 before fetching step k's
    # tokens, hiding device->host latency behind compute. EOS is then
    # discovered one step late; the extra in-flight frames for a finished
    # lane are discarded (its KV writes target its own soon-freed blocks).
    pipeline_decode: bool = True
    # Max in-flight decode dispatches (>=1). Depth d keeps d dispatches
    # queued on device before the host blocks on the oldest, hiding up to
    # d * dispatch_time of host<->device round-trip latency. EOS discovery
    # lags by d dispatches (d * frames_per_step wasted frames per finished
    # lane, into its own soon-freed blocks) and streamed frames arrive in
    # bursts one dispatch later per depth — keep small (1-3) for serving.
    pipeline_depth: int = 1
    # Statically unroll transformer layer loops in the decode path: halves
    # weight HBM traffic (lax.scan's per-layer weight slices copy) at the
    # price of longer compiles. Recommended for serving.
    unroll_layers: bool = False
    # Dense prefill materializes [B, H, T, T] attention logits; cap the
    # padded tokens (bucket_B * bucket_T) per prefill dispatch so a batch of
    # long prompts cannot blow HBM (batches are split to fit).
    max_prefill_tokens_per_step: int = 4096
    # Cap sequences per prefill dispatch. Bounds the compiled prefill
    # program set (warmup covers every power-of-two batch bucket up to
    # this, per token bucket) — a thundering herd of arrivals is chunked
    # through warmed programs, never a lazy serve-time compile. 4 puts 8
    # simultaneous arrivals through 2 dispatches (VERDICT r3 next #5: at 2
    # it was 4 sequential dispatches and dominated first-chunk p50); bench
    # and latency-critical deployments raise it to 8 (one dispatch).
    max_prefill_batch: int = 4
    # Serve-time guard (VERDICT r4 next #8): once the runner is WARMED, a
    # prompt longer than prefill_buckets[-1] is rejected at add_request
    # with a clear error instead of triggering a multi-minute lazy compile
    # on a live deployment (the server maps it to HTTP 400). Offline /
    # unwarmed engines keep the lazy power-of-two fallback; set True to
    # allow it even when warmed.
    allow_over_bucket_prompts: bool = False
    # Data-sharded serving (the multi-host deployment shape, SCALING.md):
    # per-shard KV/pool state under a manual-"data" shard_map with zero
    # cross-data collectives; requests are pinned to a shard for life.
    #   "auto"  — on whenever the mesh data axis > 1 (the only form whose
    #             decode step has no cross-host traffic);
    #   "force" — on even for a 1-device mesh (validates the shard_map
    #             programs, incl. Pallas burst kernels per shard, on 1 chip);
    #   "off"   — replicated-KV GSPMD form (testing/ablation only: forces
    #             per-frame cross-data all-gathers of every KV write).
    data_sharded: str = "auto"

    def __post_init__(self):
        # Power-of-two block size; (kv_heads, head_dim) are the tiled minor
        # dims of the cache layout, so block_size itself is unconstrained by
        # TPU tiling (unlike the reference's %256 Triton requirement,
        # reference config.py:60).
        bs = self.kvcache_block_size
        assert bs >= 4 and (bs & (bs - 1)) == 0, "block size must be a power of two"
        assert 1 <= self.tensor_parallel_size <= 64
        assert self.max_num_batched_tokens >= self.max_model_len
        assert self.max_model_len % self.kvcache_block_size == 0
        if self.quantization is not None:
            assert self.quantization in ("int8", "fp8"), (
                f"unsupported quantization {self.quantization!r} "
                "(use 'int8', 'fp8', or None)"
            )
        assert self.kv_cache_dtype in ("bf16", "int8"), (
            f"unsupported kv_cache_dtype {self.kv_cache_dtype!r} (use 'bf16' or 'int8')"
        )
        assert self.attention_impl in ("auto", "xla", "pallas", "burst")
        assert self.predictor_impl in ("auto", "xla", "pallas")
        assert 1 <= self.frames_per_step <= 16
        assert 1 <= self.pipeline_depth <= 8
        assert self.data_sharded in ("auto", "force", "off")
        # Serve-time compile safety: decode batches larger than the biggest
        # bucket are CHUNKED through warmed buckets (engine/_run_batch and
        # _step_decode_multi cap each dispatch), never lazily compiled — but
        # each extra chunk is an extra dispatch per frame, so warn when the
        # config makes that the steady state. (Any program actually compiled
        # outside the warmed set logs loudly: Runner._warn_lazy.)
        if self.max_active_streams > self.decode_buckets[-1] * max(
            1, self.data_parallel_size
        ):
            import logging

            logging.getLogger(__name__).warning(
                "max_active_streams=%d exceeds the largest decode bucket "
                "(%d): full-pool decode runs as %d chunked dispatches per "
                "frame step. Raise decode_buckets for single-dispatch "
                "decode.",
                self.max_active_streams, self.decode_buckets[-1],
                -(-self.max_active_streams // self.decode_buckets[-1]),
            )
        if self.prefill_buckets[-1] < self.max_model_len:
            import logging

            logging.getLogger(__name__).warning(
                "prefill_buckets[-1]=%d < max_model_len=%d: a prompt longer "
                "than the largest bucket lazily compiles an unwarmed "
                "prefill program at serve time (multi-minute stall through "
                "a remote TPU).",
                self.prefill_buckets[-1], self.max_model_len,
            )

    @property
    def max_blocks_per_seq(self) -> int:
        return _cdiv(self.max_model_len, self.kvcache_block_size)


# ---------------------------------------------------------------------------
# Model configs (parsed from checkpoint config.json)
# ---------------------------------------------------------------------------


@dataclass
class CodePredictorConfig:
    """Predictor ("MTP") transformer config.

    Reference: Qwen3TTSTalkerCodePredictorConfig (config.py:171-359).
    Defaults match the 1.7B family: 5 layers, 1024 hidden, 16/8 heads,
    head_dim 128, vocab 2048, 16 code groups.
    """

    vocab_size: int = 2048
    hidden_size: int = 1024
    intermediate_size: int = 3072
    num_hidden_layers: int = 5
    num_attention_heads: int = 16
    num_key_value_heads: int = 8
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    attention_bias: bool = False
    max_position_embeddings: int = 32768
    num_code_groups: int = 16  # codebooks 1..15 come from this model
    talker_hidden_size: int = 1024

    @classmethod
    def from_dict(cls, d: dict) -> "CodePredictorConfig":
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        return cls(**known)


@dataclass
class TalkerConfig:
    """Talker transformer config.

    Reference: Qwen3TTSTalkerConfig (config.py:362-561). Defaults match the
    1.7B family: 20 layers, 1024 hidden, 16/2 heads, codec vocab 3072,
    text vocab 151936 at dim 2048.
    """

    vocab_size: int = 3072
    hidden_size: int = 1024
    intermediate_size: int = 2048
    num_hidden_layers: int = 20
    num_attention_heads: int = 16
    num_key_value_heads: int = 2
    head_dim: Optional[int] = None  # None -> hidden_size // num_attention_heads
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[dict] = None
    attention_bias: bool = False
    max_position_embeddings: int = 32768
    num_code_groups: int = 16
    text_vocab_size: int = 151936
    text_hidden_size: int = 2048
    # Codec control-token ids (config.py:498-507).
    codec_eos_token_id: int = 4198
    codec_think_id: int = 4202
    codec_nothink_id: int = 4203
    codec_think_bos_id: int = 4204
    codec_think_eos_id: int = 4205
    codec_pad_id: int = 4196
    codec_bos_id: int = 4197
    spk_id: Optional[dict] = None           # speaker name -> codec row id
    spk_is_dialect: Optional[dict] = None   # speaker name -> dialect name
    codec_language_id: Optional[dict] = None  # language name -> codec row id
    code_predictor_config: CodePredictorConfig = field(
        default_factory=CodePredictorConfig
    )

    def __post_init__(self):
        if isinstance(self.code_predictor_config, dict):
            self.code_predictor_config = CodePredictorConfig.from_dict(
                self.code_predictor_config
            )
        # Predictor codec-embedding tables live at talker hidden dim
        # (qwen3_tts_predictor.py:22,26-28).
        self.code_predictor_config.talker_hidden_size = self.hidden_size
        if self.spk_id is None:
            self.spk_id = {}
        if self.spk_is_dialect is None:
            self.spk_is_dialect = {}
        if self.codec_language_id is None:
            self.codec_language_id = {}
        if self.rope_scaling is not None and "type" in self.rope_scaling:
            self.rope_scaling.setdefault("rope_type", self.rope_scaling["type"])

    @property
    def actual_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def attention_scaling(self) -> float:
        """mrope collapses to 1-D RoPE with a cos/sin scale factor.

        The reference's TalkerRotaryEmbedding (rotary_embedding.py:150-212)
        receives positions broadcast identically over the three mrope
        sections, so the 3-D rotation degenerates to standard 1-D RoPE
        scaled by ``attention_scaling`` — we implement exactly that.
        """
        if self.rope_scaling and "attention_scaling" in self.rope_scaling:
            return float(self.rope_scaling["attention_scaling"])
        return 1.0

    @classmethod
    def from_dict(cls, d: dict) -> "TalkerConfig":
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        return cls(**known)


@dataclass
class SpeakerEncoderConfig:
    """ECAPA-TDNN speaker encoder config (config.py:121-168)."""

    mel_dim: int = 128
    enc_dim: int = 1024
    enc_channels: tuple = (512, 512, 512, 512, 1536)
    enc_kernel_sizes: tuple = (5, 3, 3, 3, 1)
    enc_dilations: tuple = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 128
    enc_res2net_scale: int = 8
    enc_se_channels: int = 128
    sample_rate: int = 24000

    @classmethod
    def from_dict(cls, d: dict) -> "SpeakerEncoderConfig":
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        for key in ("enc_channels", "enc_kernel_sizes", "enc_dilations"):
            if key in known and isinstance(known[key], list):
                known[key] = tuple(known[key])
        return cls(**known)


@dataclass
class Qwen3TTSConfig:
    """Top-level model config (config.py:564-610)."""

    talker_config: TalkerConfig = field(default_factory=TalkerConfig)
    speaker_encoder_config: SpeakerEncoderConfig = field(
        default_factory=SpeakerEncoderConfig
    )
    tokenizer_type: Optional[str] = None
    tts_model_size: Optional[str] = None
    tts_model_type: Optional[str] = None
    im_start_token_id: int = 151644
    im_end_token_id: int = 151645
    tts_pad_token_id: int = 151671
    tts_bos_token_id: int = 151672
    tts_eos_token_id: int = 151673

    def __post_init__(self):
        if isinstance(self.talker_config, dict):
            self.talker_config = TalkerConfig.from_dict(self.talker_config)
        if isinstance(self.speaker_encoder_config, dict):
            self.speaker_encoder_config = SpeakerEncoderConfig.from_dict(
                self.speaker_encoder_config
            )

    @classmethod
    def from_dict(cls, d: dict) -> "Qwen3TTSConfig":
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        return cls(**known)

    @classmethod
    def from_pretrained(cls, model_path: str) -> "Qwen3TTSConfig":
        with open(os.path.join(model_path, "config.json")) as f:
            return cls.from_dict(json.load(f))


# Preset configs for the two published model sizes. The 1.7B preset matches
# the reference defaults (config.py:288-313,473-508); the 0.6B preset scales
# the talker down (no instruct support per utils/prompt.py:52-54).
def preset_config(name: str) -> Qwen3TTSConfig:
    name = name.lower()
    if name in ("1.7b", "1_7b", "17"):
        # NOTE: vocab 4224, not the dataclass default 3072 — the codec
        # control ids (codec_pad 4196 .. codec_think_eos 4205) must be valid
        # rows of the codec embedding, as in real checkpoints' config.json.
        return Qwen3TTSConfig(
            talker_config=TalkerConfig(vocab_size=4224), tts_model_size="1.7b"
        )
    if name in ("0.6b", "0_6b", "06"):
        talker = TalkerConfig(
            vocab_size=4224,
            hidden_size=768,
            intermediate_size=1536,
            num_hidden_layers=16,
            num_attention_heads=12,
            num_key_value_heads=2,
            head_dim=64,
            code_predictor_config=CodePredictorConfig(
                hidden_size=768,
                intermediate_size=2304,
                num_hidden_layers=4,
                num_attention_heads=12,
                num_key_value_heads=6,
                head_dim=64,
            ),
        )
        return Qwen3TTSConfig(talker_config=talker, tts_model_size="0.6b")
    # Tiny config for tests: real structure, toy sizes.
    if name in ("tiny", "test"):
        talker = TalkerConfig(
            vocab_size=4300,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            text_vocab_size=512,
            text_hidden_size=96,
            code_predictor_config=CodePredictorConfig(
                vocab_size=128,
                hidden_size=64,
                intermediate_size=128,
                num_hidden_layers=2,
                num_attention_heads=4,
                num_key_value_heads=2,
                head_dim=16,
            ),
        )
        return Qwen3TTSConfig(talker_config=talker, tts_model_size="tiny")
    raise ValueError(f"unknown preset {name!r}")
