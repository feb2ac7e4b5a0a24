"""Cross-check prompt preparation against the reference implementation.

The reference's utils/generation.py is pure torch (no CUDA deps), so we load
it straight from /root/reference and feed both implementations identical
embedding tables; outputs must match to float tolerance. This pins the
trickiest behavioural surface (prompt layout) to the reference exactly.
"""

import importlib.util
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from nano_qwen3tts_tpu.config import preset_config
from nano_qwen3tts_tpu.utils.generation import (
    EmbeddingTables,
    batch_inputs,
    prepare_inputs,
)

REF_GEN = "/root/reference/nano-qwen3tts-vllm/utils/generation.py"


@pytest.fixture(scope="module")
def ref_gen():
    spec = importlib.util.spec_from_file_location("ref_generation", REF_GEN)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def cfg():
    c = preset_config("tiny")
    # tiny text vocab (512): move the tts control tokens inside it
    c.tts_bos_token_id, c.tts_eos_token_id, c.tts_pad_token_id = 505, 506, 507
    c.talker_config.spk_id = {"vivian": 3000, "dylan": 3001}
    c.talker_config.spk_is_dialect = {"dylan": "beijing"}
    c.talker_config.codec_language_id = {"english": 4100, "chinese": 4101, "beijing": 4102}
    return c


@pytest.fixture(scope="module")
def tables(cfg):
    r = np.random.default_rng(42)
    tc = cfg.talker_config
    return EmbeddingTables(
        text_embedding=r.standard_normal((tc.text_vocab_size, tc.text_hidden_size)).astype(np.float32) * 0.1,
        codec_embedding=r.standard_normal((tc.vocab_size, tc.hidden_size)).astype(np.float32) * 0.1,
        fc1_w=r.standard_normal((tc.text_hidden_size, tc.text_hidden_size)).astype(np.float32) * 0.05,
        fc1_b=r.standard_normal(tc.text_hidden_size).astype(np.float32) * 0.01,
        fc2_w=r.standard_normal((tc.text_hidden_size, tc.hidden_size)).astype(np.float32) * 0.05,
        fc2_b=r.standard_normal(tc.hidden_size).astype(np.float32) * 0.01,
        predictor_codec=r.standard_normal(
            (15, tc.code_predictor_config.vocab_size, tc.hidden_size)
        ).astype(np.float32) * 0.1,
    )


def torch_callables(tables):
    text_w = torch.from_numpy(tables.text_embedding)
    codec_w = torch.from_numpy(tables.codec_embedding)
    fc1w = torch.from_numpy(tables.fc1_w)
    fc1b = torch.from_numpy(tables.fc1_b)
    fc2w = torch.from_numpy(tables.fc2_w)
    fc2b = torch.from_numpy(tables.fc2_b)

    def text_embedding(ids):
        return text_w[ids]

    def input_embedding(ids):
        return codec_w[torch.as_tensor(ids)]

    def text_projection(x):
        h = x @ fc1w + fc1b
        return torch.nn.functional.silu(h) @ fc2w + fc2b

    pred_embs = [
        (lambda i: (lambda ids: torch.from_numpy(tables.predictor_codec[i])[ids]))(i)
        for i in range(15)
    ]
    return text_embedding, input_embedding, text_projection, pred_embs


def run_both(cfg, tables, ref_gen, *, input_ids, instruct_ids=None, ref_ids=None,
             voice_clone_prompt=None, languages=None, speakers=None,
             non_streaming_mode=False, spk_embeds=None):
    text_embedding, input_embedding, text_projection, pred_embs = torch_callables(tables)

    def icl_fn(text_id, ref_id, ref_code, tts_pad_embed, tts_eos_embed, non_streaming_mode):
        return ref_gen.generate_icl_prompt(
            text_id=text_id, ref_id=ref_id, ref_code=torch.as_tensor(ref_code),
            tts_pad_embed=tts_pad_embed, tts_eos_embed=tts_eos_embed,
            non_streaming_mode=non_streaming_mode, config=cfg,
            text_embedding=text_embedding, input_embedding=input_embedding,
            text_projection=text_projection, code_predictor_embeddings=pred_embs,
            device="cpu",
        )

    vc_torch = None
    if voice_clone_prompt is not None:
        vc_torch = dict(voice_clone_prompt)
        vc_torch["ref_spk_embedding"] = [
            torch.from_numpy(np.asarray(e, np.float32))
            for e in voice_clone_prompt["ref_spk_embedding"]
        ]
        if vc_torch.get("ref_code") is not None:
            vc_torch["ref_code"] = [
                torch.as_tensor(c) if c is not None else None
                for c in vc_torch["ref_code"]
            ]

    ref_out = ref_gen.prepare_inputs(
        cfg,
        [torch.as_tensor(np.asarray(i)) for i in input_ids],
        instruct_ids=[torch.as_tensor(np.asarray(i)) if i is not None else None for i in instruct_ids] if instruct_ids else None,
        ref_ids=[torch.as_tensor(np.asarray(i)) if i is not None else None for i in ref_ids] if ref_ids else None,
        voice_clone_prompt=vc_torch,
        languages=languages,
        speakers=speakers,
        non_streaming_mode=non_streaming_mode,
        text_embedding=text_embedding,
        input_embedding=input_embedding,
        text_projection=text_projection,
        device="cpu",
        generate_speaker_prompt_fn=lambda p: [e.float() for e in p["ref_spk_embedding"]],
        generate_icl_prompt_fn=icl_fn,
    )
    ref_embeds, ref_trailing, ref_pad, ref_mask = [t.detach().numpy() for t in ref_out]

    my_embeds, my_trailing, my_pad = prepare_inputs(
        cfg, input_ids, instruct_ids=instruct_ids, ref_ids=ref_ids,
        voice_clone_prompt=voice_clone_prompt, languages=languages,
        speakers=speakers, non_streaming_mode=non_streaming_mode, tables=tables,
    )
    my_batch, my_trail_batch, my_mask = batch_inputs(my_embeds, my_trailing, my_pad)
    return (ref_embeds, ref_trailing, ref_pad, ref_mask), (my_batch, my_trail_batch, my_pad, my_mask)


def ids(rng, L=14):
    return rng.integers(0, 500, size=(1, L))


class TestPreparInputsParity:
    def test_custom_voice_non_streaming(self, cfg, tables, ref_gen):
        rng = np.random.default_rng(1)
        (re, rt, rp, rm), (me, mt, mp, mm) = run_both(
            cfg, tables, ref_gen,
            input_ids=[ids(rng)], languages=["English"], speakers=["Vivian"],
            non_streaming_mode=True,
        )
        np.testing.assert_array_equal(rm, mm)
        np.testing.assert_allclose(me, re, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(mt, rt, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(mp, rp.reshape(-1), rtol=1e-5, atol=1e-5)

    def test_custom_voice_streaming(self, cfg, tables, ref_gen):
        rng = np.random.default_rng(2)
        (re, rt, rp, rm), (me, mt, mp, mm) = run_both(
            cfg, tables, ref_gen,
            input_ids=[ids(rng)], languages=["English"], speakers=["Vivian"],
            non_streaming_mode=False,
        )
        np.testing.assert_allclose(me, re, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(mt, rt, rtol=1e-5, atol=1e-5)

    def test_dialect_override(self, cfg, tables, ref_gen):
        rng = np.random.default_rng(3)
        (re, rt, _, _), (me, mt, _, _) = run_both(
            cfg, tables, ref_gen,
            input_ids=[ids(rng)], languages=["Chinese"], speakers=["Dylan"],
            non_streaming_mode=True,
        )
        np.testing.assert_allclose(me, re, rtol=1e-5, atol=1e-5)

    def test_auto_language_no_speaker(self, cfg, tables, ref_gen):
        rng = np.random.default_rng(4)
        (re, rt, _, _), (me, mt, _, _) = run_both(
            cfg, tables, ref_gen,
            input_ids=[ids(rng)], languages=["Auto"], speakers=[""],
            non_streaming_mode=False,
        )
        np.testing.assert_allclose(me, re, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(mt, rt, rtol=1e-5, atol=1e-5)

    def test_voice_design_instruct(self, cfg, tables, ref_gen):
        rng = np.random.default_rng(5)
        (re, rt, _, _), (me, mt, _, _) = run_both(
            cfg, tables, ref_gen,
            input_ids=[ids(rng)], instruct_ids=[ids(rng, 7)],
            languages=["English"], speakers=None, non_streaming_mode=True,
        )
        np.testing.assert_allclose(me, re, rtol=1e-5, atol=1e-5)

    def test_batch_mixed_lengths(self, cfg, tables, ref_gen):
        rng = np.random.default_rng(6)
        (re, rt, _, rm), (me, mt, _, mm) = run_both(
            cfg, tables, ref_gen,
            input_ids=[ids(rng, 12), ids(rng, 18)],
            languages=["English", "Auto"], speakers=["Vivian", ""],
            non_streaming_mode=True,
        )
        np.testing.assert_array_equal(rm, mm)
        np.testing.assert_allclose(me, re, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(mt, rt, rtol=1e-5, atol=1e-5)

    def test_voice_clone_xvector(self, cfg, tables, ref_gen):
        rng = np.random.default_rng(7)
        xvec = rng.standard_normal(cfg.talker_config.hidden_size).astype(np.float32)
        vc = {
            "ref_code": [None],
            "ref_spk_embedding": [xvec],
            "x_vector_only_mode": [True],
            "icl_mode": [False],
        }
        (re, rt, _, _), (me, mt, _, _) = run_both(
            cfg, tables, ref_gen,
            input_ids=[ids(rng)], voice_clone_prompt=vc,
            languages=["Auto"], non_streaming_mode=True,
        )
        np.testing.assert_allclose(me, re, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("non_streaming", [True, False])
    def test_voice_clone_icl(self, cfg, tables, ref_gen, non_streaming):
        rng = np.random.default_rng(8)
        xvec = rng.standard_normal(cfg.talker_config.hidden_size).astype(np.float32)
        Tc = 9
        ref_code = np.stack(
            [rng.integers(0, 100, size=16) for _ in range(Tc)]
        ).astype(np.int64)  # [Tc, 16]
        vc = {
            "ref_code": [ref_code],
            "ref_spk_embedding": [xvec],
            "x_vector_only_mode": [False],
            "icl_mode": [True],
        }
        (re, rt, _, _), (me, mt, _, _) = run_both(
            cfg, tables, ref_gen,
            input_ids=[ids(rng, 20)], ref_ids=[ids(rng, 12)],
            voice_clone_prompt=vc, languages=["Auto"],
            non_streaming_mode=non_streaming,
        )
        np.testing.assert_allclose(me, re, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(mt, rt, rtol=1e-5, atol=1e-5)
