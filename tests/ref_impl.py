"""Independent numpy reference implementation of the Qwen3-TTS decoder math.

Written from the architecture spec (pre-norm blocks, QK-RMSNorm, rotate-half
RoPE, SwiGLU, GQA causal attention) as a float32 golden oracle for the JAX
models. Deliberately naive: full materialized attention matrices, python
loops — clarity over speed.
"""

from __future__ import annotations

import numpy as np


def rms_norm(x, w, eps):
    var = np.mean(x.astype(np.float64) ** 2, axis=-1, keepdims=True)
    return (x / np.sqrt(var + eps)).astype(np.float32) * w


def rope(x, positions, theta, scaling=1.0):
    # x: [T, H, d]; positions: [T]
    d = x.shape[-1]
    inv = 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64) / d))
    freqs = positions[:, None].astype(np.float64) * inv  # [T, d/2]
    cos = (np.cos(freqs) * scaling).astype(np.float32)[:, None, :]
    sin = (np.sin(freqs) * scaling).astype(np.float32)[:, None, :]
    x1, x2 = x[..., : d // 2], x[..., d // 2 :]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def causal_attention(q, k, v, scale):
    # q: [T, Hq, d], k/v: [S, Hkv, d] with S >= T (q aligned to the last T keys)
    T, Hq, d = q.shape
    S, Hkv, _ = k.shape
    rep = Hq // Hkv
    k = np.repeat(k, rep, axis=1)
    v = np.repeat(v, rep, axis=1)
    out = np.zeros_like(q)
    offset = S - T
    for h in range(Hq):
        logits = (q[:, h] @ k[:, h].T) * scale  # [T, S]
        mask = np.tril(np.ones((T, S), dtype=bool), k=offset)
        logits = np.where(mask, logits, -np.inf)
        p = np.exp(logits - logits.max(axis=-1, keepdims=True))
        p = p / p.sum(axis=-1, keepdims=True)
        out[:, h] = p @ v[:, h]
    return out


class Layer:
    def __init__(self, lp_np, spec):
        self.p = lp_np
        self.spec = spec

    def __call__(self, h, positions, k_hist=None, v_hist=None):
        """h: [T, D]. Optionally prepend KV history [S0, Hkv, d]. Returns
        (h_out, k_all, v_all)."""
        s = self.spec
        p = self.p
        xn = rms_norm(h, p["input_layernorm"], s.rms_norm_eps)
        q = xn @ p["q_w"]
        k = xn @ p["k_w"]
        v = xn @ p["v_w"]
        if "q_b" in p:
            q, k, v = q + p["q_b"], k + p["k_b"], v + p["v_b"]
        T = h.shape[0]
        q = q.reshape(T, s.num_heads, s.head_dim)
        k = k.reshape(T, s.num_kv_heads, s.head_dim)
        v = v.reshape(T, s.num_kv_heads, s.head_dim)
        if "q_norm" in p:
            q = rms_norm(q, p["q_norm"], s.rms_norm_eps)
            k = rms_norm(k, p["k_norm"], s.rms_norm_eps)
        q = rope(q, positions, s.rope_theta, s.attention_scaling)
        k = rope(k, positions, s.rope_theta, s.attention_scaling)
        if k_hist is not None:
            k_all = np.concatenate([k_hist, k], axis=0)
            v_all = np.concatenate([v_hist, v], axis=0)
        else:
            k_all, v_all = k, v
        attn = causal_attention(q, k_all, v_all, s.scale)
        h = h + attn.reshape(T, -1) @ p["o_w"]
        xn2 = rms_norm(h, p["post_attention_layernorm"], s.rms_norm_eps)
        gate = xn2 @ p["gate_w"]
        up = xn2 @ p["up_w"]
        silu = gate / (1.0 + np.exp(-gate))
        h = h + (silu * up) @ p["down_w"]
        return h, k_all, v_all


def to_np(tree):
    import jax

    return jax.tree.map(lambda a: np.asarray(a, dtype=np.float32), tree)


def unstack_layers(layers_np):
    n = layers_np["input_layernorm"].shape[0]
    return [
        {k: v[i] for k, v in layers_np.items()} for i in range(n)
    ]


def forward_stack(params_np, spec, embeds, positions, kv_hists=None):
    """embeds [T, D], positions [T]; kv_hists: list of (k,v) per layer or None.
    Returns (hidden_after_final_norm [T, D], new kv hists)."""
    h = embeds.astype(np.float32)
    hists = []
    for i, lp in enumerate(unstack_layers(params_np["layers"])):
        layer = Layer(lp, spec)
        kh, vh = (kv_hists[i] if kv_hists is not None else (None, None))
        h, k_all, v_all = layer(h, positions, kh, vh)
        hists.append((k_all, v_all))
    return rms_norm(h, params_np["norm"], spec.rms_norm_eps), hists


def talker_reference(params_np, spec, embeds, positions):
    """Full-sequence talker forward. Returns (logits_last [V], hidden [T, D])."""
    hidden, _ = forward_stack(params_np, spec, embeds, positions)
    logits = hidden[-1] @ params_np["codec_head_w"]
    return logits, hidden


def predictor_reference_argmax(params_np, spec, talker_hidden, cb0_embed):
    """Greedy (argmax) 15-step predictor rollout for one sequence.

    talker_hidden/cb0_embed: [Dt]. Returns (tokens [15], emb_sum [Dt]).
    """

    def proj(x):
        if "proj_w" in params_np:
            return x @ params_np["proj_w"] + params_np["proj_b"]
        return x

    x = np.stack([talker_hidden, cb0_embed]).astype(np.float32)  # [2, Dt]
    x = proj(x)
    hidden, hists = forward_stack(params_np, spec, x, np.arange(2))
    logits = hidden[-1] @ params_np["lm_heads"][0]
    tok = int(np.argmax(logits))
    tokens = [tok]
    emb_sum = np.zeros_like(talker_hidden, dtype=np.float32)
    for i in range(1, 15):
        emb = params_np["codec_embeddings"][i - 1][tok]
        emb_sum += emb
        x = proj(emb[None, :])
        hidden, hists = forward_stack(
            params_np, spec, x, np.array([i + 1]), kv_hists=hists
        )
        logits = hidden[-1] @ params_np["lm_heads"][i]
        tok = int(np.argmax(logits))
        tokens.append(tok)
    emb_sum += params_np["codec_embeddings"][14][tok]
    return np.array(tokens), emb_sum
