"""Talker prompt/feature preparation.

Behavioural port of reference utils/generation.py:18-515 (``prepare_inputs``,
``generate_speaker_prompt``, ``generate_icl_prompt``) to numpy. The prompt is
not token ids but a precomputed embedding sequence: text-token embeddings
projected into talker space, overlaid with codec control-token embeddings,
speaker embeddings, and (voice clone) reference codec embeddings.

Differences from the reference (deliberate):
* Everything is host-side numpy float32 — prompt prep is tiny (a few hundred
  tokens through two matmuls) and keeping it off the device avoids competing
  with the serving hot path for TPU time.
* Outputs are per-request ``[L, D]`` embedding sequences and ``[T, D]``
  trailing hiddens; the engine's bucketing replaces the reference's
  left-padded batch + attention mask (generation.py:320-379). A
  ``batch_inputs`` helper reproduces the reference's batched layout for
  compatibility/tests.

Layout semantics preserved exactly — role tokens, think/language control
span, speaker slot, pad/bos overlay, streaming vs non-streaming text
placement, and the ICL reference-code interleave. Cited per-block below.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np


@dataclass
class EmbeddingTables:
    """Host-side (numpy, f32) embedding tables + text projection weights.

    The main-process analogue of the reference's embeddings-only loading
    (utils/embedding_loader.py:17-112) — the serving engine holds full
    models; prompt prep needs only these.
    """

    text_embedding: np.ndarray  # [Vt, Dt]
    codec_embedding: np.ndarray  # [Vc, D]
    fc1_w: np.ndarray  # [Dt, Dt]
    fc1_b: np.ndarray
    fc2_w: np.ndarray  # [Dt, D]
    fc2_b: np.ndarray
    predictor_codec: np.ndarray  # [15, Vp, D]

    @classmethod
    def from_params(cls, talker_params: dict, predictor_params: dict):
        f = lambda a: np.asarray(a, np.float32)
        tp = talker_params["text_projection"]
        return cls(
            text_embedding=f(talker_params["text_embedding"]),
            codec_embedding=f(talker_params["codec_embedding"]),
            fc1_w=f(tp["fc1_w"]),
            fc1_b=f(tp["fc1_b"]),
            fc2_w=f(tp["fc2_w"]),
            fc2_b=f(tp["fc2_b"]),
            predictor_codec=f(predictor_params["codec_embeddings"]),
        )

    # -- primitive ops ------------------------------------------------------

    def text_emb(self, ids: np.ndarray) -> np.ndarray:
        return self.text_embedding[np.asarray(ids, np.int64)]

    def codec_emb(self, ids) -> np.ndarray:
        return self.codec_embedding[np.asarray(ids, np.int64)]

    def project(self, x: np.ndarray) -> np.ndarray:
        h = x @ self.fc1_w + self.fc1_b
        h = h * (1.0 / (1.0 + np.exp(-h)))  # silu
        return h @ self.fc2_w + self.fc2_b

    def text_proj_emb(self, ids) -> np.ndarray:
        return self.project(self.text_emb(ids))


def generate_speaker_prompt(voice_clone_prompt: dict) -> List[np.ndarray]:
    """Extract per-item x-vector speaker embeddings (generation.py:382-409)."""
    return [
        np.asarray(e, np.float32).reshape(-1)
        for e in voice_clone_prompt["ref_spk_embedding"]
    ]


def generate_icl_prompt(
    *,
    text_id: np.ndarray,  # [1, Tt]
    ref_id: np.ndarray,  # [1, Tr]
    ref_code: np.ndarray,  # [Tc, 16] reference codec frames
    tts_pad_embed: np.ndarray,  # [1, 1, D]
    tts_eos_embed: np.ndarray,  # [1, 1, D]
    non_streaming_mode: bool,
    config,
    tables: EmbeddingTables,
):
    """ICL prompt: ref+target text embeds overlaid with summed reference
    codec embeddings (generation.py:412-515). Returns (icl_embed [1,T,D],
    trailing [1,T',D])."""
    tc = config.talker_config
    n_groups = tc.num_code_groups

    text_embed = tables.text_proj_emb(
        np.concatenate([ref_id, text_id], axis=-1)
    )  # [1, T1, D]
    text_embed = np.concatenate([text_embed, tts_eos_embed], axis=1)

    ref_code = np.asarray(ref_code)
    if ref_code.ndim == 3:
        ref_code = ref_code[0]
    # Per-frame sum of the 16 codebook embeddings: cb0 via the talker table,
    # cb1..15 via the predictor per-codebook tables (generation.py:464-481).
    parts = [tables.codec_emb(ref_code[:, 0])]
    for i in range(1, n_groups):
        parts.append(tables.predictor_codec[i - 1][ref_code[:, i]])
    codec_sum = np.sum(parts, axis=0)[None]  # [1, Tc, D]
    codec_bos = tables.codec_emb([[tc.codec_bos_id]])
    codec_embed = np.concatenate([codec_bos, codec_sum], axis=1)

    text_lens, codec_lens = text_embed.shape[1], codec_embed.shape[1]
    if non_streaming_mode:
        icl = text_embed + tables.codec_emb([[tc.codec_pad_id] * text_lens])
        icl = np.concatenate([icl, codec_embed + tts_pad_embed], axis=1)
        return icl, tts_pad_embed
    if text_lens > codec_lens:
        return text_embed[:, :codec_lens] + codec_embed, text_embed[:, codec_lens:]
    pad = np.concatenate(
        [text_embed] + [tts_pad_embed] * (codec_lens - text_lens), axis=1
    )
    return pad + codec_embed, tts_pad_embed


def prepare_inputs(
    config,
    input_ids: List[np.ndarray],  # list of [1, L] token arrays
    instruct_ids: Optional[List[Optional[np.ndarray]]] = None,
    ref_ids: Optional[List[Optional[np.ndarray]]] = None,
    voice_clone_prompt: Optional[dict] = None,
    languages: Optional[List[str]] = None,
    speakers: Optional[List[Optional[str]]] = None,
    non_streaming_mode: bool = False,
    *,
    tables: EmbeddingTables,
    voice_clone_spk_embeds: Optional[List[np.ndarray]] = None,
):
    """Build talker prefill embeddings (generation.py:18-379).

    Returns (embeds_list [each (L_i, D)], trailing_list [each (T_i, D)],
    tts_pad [D]).
    """
    tc = config.talker_config
    n = len(input_ids)
    prefix_embeds: List[List[np.ndarray]] = [[] for _ in range(n)]

    if voice_clone_prompt is not None and voice_clone_spk_embeds is None:
        voice_clone_spk_embeds = generate_speaker_prompt(voice_clone_prompt)

    # VoiceDesign: instruct tokens projected + prepended (generation.py:73-87)
    if instruct_ids is not None:
        for idx, iid in enumerate(instruct_ids):
            if iid is not None:
                iid = np.asarray(iid)
                if iid.ndim == 1:
                    iid = iid[None]
                prefix_embeds[idx].append(tables.text_proj_emb(iid))

    speakers = speakers if speakers is not None else [None] * n
    languages = languages if languages is not None else ["auto"] * n

    embeds_out: List[np.ndarray] = []
    trailing_out: List[np.ndarray] = []
    tts_pad_vec: Optional[np.ndarray] = None

    for idx, (input_id, language, speaker) in enumerate(
        zip(input_ids, languages, speakers)
    ):
        input_id = np.asarray(input_id)
        if input_id.ndim == 1:
            input_id = input_id[None]

        # speaker embedding (generation.py:100-122)
        if voice_clone_spk_embeds is None:
            if not speaker:
                speaker_embed = None
            else:
                if speaker.lower() not in (tc.spk_id or {}):
                    raise NotImplementedError(f"Speaker {speaker} not implemented")
                speaker_embed = tables.codec_emb(tc.spk_id[speaker.lower()])
        else:
            vc = voice_clone_prompt
            if vc["x_vector_only_mode"][idx] or vc["icl_mode"][idx]:
                speaker_embed = voice_clone_spk_embeds[idx]
            else:
                speaker_embed = None

        # language id incl. dialect override (generation.py:124-145)
        assert language is not None
        if language.lower() == "auto":
            language_id = None
        else:
            if language.lower() not in (tc.codec_language_id or {}):
                raise NotImplementedError(f"Language {language} not implemented")
            language_id = tc.codec_language_id[language.lower()]
        if (
            language.lower() in ("chinese", "auto")
            and speaker
            and (tc.spk_is_dialect or {}).get(speaker.lower(), False) is not False
        ):
            dialect = tc.spk_is_dialect[speaker.lower()]
            language_id = tc.codec_language_id[dialect]

        # tts control-token embeds (generation.py:147-162)
        ctrl = tables.text_proj_emb(
            [[config.tts_bos_token_id, config.tts_eos_token_id, config.tts_pad_token_id]]
        )
        tts_bos_embed = ctrl[:, 0:1]
        tts_eos_embed = ctrl[:, 1:2]
        tts_pad_embed = ctrl[:, 2:3]
        tts_pad_vec = tts_pad_embed[0, 0]

        # think/language codec control span (generation.py:164-200)
        if language_id is None:
            codec_prefill = [
                [tc.codec_nothink_id, tc.codec_think_bos_id, tc.codec_think_eos_id]
            ]
        else:
            codec_prefill = [
                [
                    tc.codec_think_id,
                    tc.codec_think_bos_id,
                    language_id,
                    tc.codec_think_eos_id,
                ]
            ]
        codec_in_0 = tables.codec_emb(codec_prefill)
        codec_in_1 = tables.codec_emb([[tc.codec_pad_id, tc.codec_bos_id]])
        if speaker_embed is None:
            codec_input = np.concatenate([codec_in_0, codec_in_1], axis=1)
        else:
            codec_input = np.concatenate(
                [codec_in_0, np.reshape(speaker_embed, (1, 1, -1)), codec_in_1],
                axis=1,
            )

        # role tokens + pad/bos overlay (generation.py:216-232)
        role_embed = tables.text_proj_emb(input_id[:, :3])
        overlay = (
            np.concatenate(
                [
                    np.broadcast_to(
                        tts_pad_embed,
                        (1, codec_input.shape[1] - 2, tts_pad_embed.shape[-1]),
                    ),
                    tts_bos_embed,
                ],
                axis=1,
            )
            + codec_input[:, :-1]
        )
        talker_embed = np.concatenate([role_embed, overlay], axis=1)

        icl_active = (
            voice_clone_prompt is not None
            and voice_clone_prompt.get("ref_code") is not None
            and voice_clone_prompt["icl_mode"][idx]
        )
        if icl_active:
            # (generation.py:234-258)
            if ref_ids is None or ref_ids[idx] is None:
                raise ValueError("ICL mode requires ref_ids (reference transcript)")
            rid = np.asarray(ref_ids[idx])
            if rid.ndim == 1:
                rid = rid[None]
            icl_embed, trailing = generate_icl_prompt(
                text_id=input_id[:, 3:-5],
                ref_id=rid[:, 3:-2],
                ref_code=voice_clone_prompt["ref_code"][idx],
                tts_pad_embed=tts_pad_embed,
                tts_eos_embed=tts_eos_embed,
                non_streaming_mode=non_streaming_mode,
                config=config,
                tables=tables,
            )
            talker_embed = np.concatenate([talker_embed, icl_embed], axis=1)
        else:
            # first text token + codec bos (generation.py:260-267)
            talker_embed = np.concatenate(
                [
                    talker_embed,
                    tables.text_proj_emb(input_id[:, 3:4]) + codec_input[:, -1:],
                ],
                axis=1,
            )
            if non_streaming_mode:
                # full text inlined into the prompt (generation.py:268-305)
                talker_embed = talker_embed[:, :-1]
                body = np.concatenate(
                    [tables.text_proj_emb(input_id[:, 3:-5]), tts_eos_embed],
                    axis=1,
                ) + tables.codec_emb(
                    [[tc.codec_pad_id] * (input_id[:, 3:-5].shape[1] + 1)]
                )
                bos_tail = tts_pad_embed + tables.codec_emb([[tc.codec_bos_id]])
                talker_embed = np.concatenate(
                    [talker_embed, body, bos_tail], axis=1
                )
                trailing = tts_pad_embed
            else:
                # streaming: text trails the codec stream (generation.py:307-315)
                trailing = np.concatenate(
                    [tables.text_proj_emb(input_id[:, 4:-5]), tts_eos_embed],
                    axis=1,
                )

        pieces = prefix_embeds[idx] + [talker_embed]
        embeds_out.append(np.concatenate(pieces, axis=1)[0].astype(np.float32))
        trailing_out.append(trailing[0].astype(np.float32))

    return embeds_out, trailing_out, tts_pad_vec.astype(np.float32)


def batch_inputs(
    embeds_list: List[np.ndarray],
    trailing_list: List[np.ndarray],
    tts_pad: np.ndarray,
):
    """Reproduce the reference's batched layout for compatibility: left-padded
    prompt batch + attention mask, trailing hiddens right-padded with the
    tts-pad embedding (generation.py:320-379)."""
    n = len(embeds_list)
    D = embeds_list[0].shape[-1]
    max_len = max(e.shape[0] for e in embeds_list)
    batch = np.zeros((n, max_len, D), np.float32)
    mask = np.zeros((n, max_len), np.int64)
    for i, e in enumerate(embeds_list):
        batch[i, max_len - e.shape[0] :] = e
        mask[i, max_len - e.shape[0] :] = 1
    t_max = max(t.shape[0] for t in trailing_list)
    trail = np.broadcast_to(tts_pad, (n, t_max, D)).copy()
    for i, t in enumerate(trailing_list):
        trail[i, : t.shape[0]] = t
    return batch, trail, mask
