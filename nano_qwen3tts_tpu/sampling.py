"""Sampling parameters (parity with reference sampling_params.py:4-15)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class SamplingParams:
    temperature: float = 1.0
    max_tokens: int = 64
    ignore_eos: bool = False
    do_sample: bool = True
    top_k: int = 50
    top_p: float = 1.0  # declared but not applied, matching reference sampler.py:15-24

    def __post_init__(self):
        # The reference asserts temperature >= 1e-10 (greedy is expressed as a
        # tiny temperature, sampling_params.py:14).
        assert self.temperature > 1e-10, "greedy sampling: use a tiny temperature"
