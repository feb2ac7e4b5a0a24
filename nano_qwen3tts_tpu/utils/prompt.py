"""Chat-template prompt construction for the three product modes.

Parity with reference utils/prompt.py:16-79 (templates match the original
Qwen3-TTS character-for-character) and processor.py:27-106 (the thin Qwen2
tokenizer wrapper — on TPU we skip the HF ProcessorMixin ceremony and call
the tokenizer directly).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Union

import numpy as np


def build_assistant_text(text: str) -> str:
    return f"<|im_start|>assistant\n{text}<|im_end|>\n<|im_start|>assistant\n"


def build_instruct_text(instruct: str) -> str:
    return f"<|im_start|>user\n{instruct}<|im_end|>\n"


def build_ref_text(text: str) -> str:
    """Reference-transcript template for ICL voice clone (interface.py:472-481)."""
    return f"<|im_start|>assistant\n{text}<|im_end|>\n"


class Tokenizer:
    """Qwen2 tokenizer wrapper; returns [1, L] int64 numpy arrays."""

    def __init__(self, model_path: str):
        from transformers import AutoTokenizer

        self.tok = AutoTokenizer.from_pretrained(model_path, padding_side="left")

    def __call__(self, text: str) -> np.ndarray:
        ids = self.tok(text, return_tensors="np")["input_ids"]
        return np.asarray(ids, np.int64).reshape(1, -1)


def _ensure_list(x: Any) -> List[Any]:
    return x if isinstance(x, list) else [x]


def prepare_custom_voice_prompt(
    text: Union[str, List[str]],
    speaker: Union[str, List[str]],
    language: Union[str, List[str]],
    instruct: Optional[Union[str, List[str]]] = None,
    model_size: str = "1.7b",
    *,
    tokenize: Callable[[str], np.ndarray],
):
    """Returns (input_ids, instruct_ids, speakers, languages) — parity with
    reference prepare_custom_voice_prompt (utils/prompt.py:39-79), including
    the 0.6B instruct-disable rule (:52-54) and singleton broadcasting."""
    texts = _ensure_list(text)
    languages = (
        _ensure_list(language)
        if isinstance(language, list)
        else ([language] * len(texts) if language is not None else ["Auto"] * len(texts))
    )
    speakers = _ensure_list(speaker)
    if model_size in ("0b6", "0.6b"):
        instruct = None
    instructs = (
        _ensure_list(instruct)
        if isinstance(instruct, list)
        else ([instruct] * len(texts) if instruct is not None else [""] * len(texts))
    )
    if len(languages) == 1 and len(texts) > 1:
        languages = languages * len(texts)
    if len(speakers) == 1 and len(texts) > 1:
        speakers = speakers * len(texts)
    if len(instructs) == 1 and len(texts) > 1:
        instructs = instructs * len(texts)
    if not (len(texts) == len(languages) == len(speakers) == len(instructs)):
        raise ValueError(
            f"Batch size mismatch: text={len(texts)}, language={len(languages)}, "
            f"speaker={len(speakers)}, instruct={len(instructs)}"
        )
    input_ids = [tokenize(build_assistant_text(t)) for t in texts]
    instruct_ids = [
        None if (ins is None or ins == "") else tokenize(build_instruct_text(ins))
        for ins in instructs
    ]
    return input_ids, instruct_ids, speakers, languages
