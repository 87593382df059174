"""Pure-numpy oracle of the reference forward pass (lib/llama.cpp:272-499).

Implements exactly the math of Model::eval — rms_norm(eps=1e-6), interleaved
RoPE (theta = p * 10000^(-2i/n_rot)), causal softmax attention with 1/sqrt(hd)
scaling, silu-gated FFN — in float32/float64 numpy, for tiny random models.
Used to validate the JAX forward pass (tests/test_model.py).
"""
import numpy as np


def rms_norm(x, w, eps=1e-6):
    ms = (x.astype(np.float64) ** 2).mean(-1, keepdims=True)
    return (x / np.sqrt(ms + eps) * w).astype(np.float64)


def rope_interleaved(x, positions, n_rot):
    # x: [T, H, hd]; positions: [T]
    t, h, hd = x.shape
    out = x.astype(np.float64).copy()
    half = n_rot // 2
    for ti in range(t):
        p = positions[ti]
        for i in range(half):
            theta = p * (10000.0 ** (-2.0 * i / n_rot))
            c, s = np.cos(theta), np.sin(theta)
            x0 = x[ti, :, 2 * i].astype(np.float64)
            x1 = x[ti, :, 2 * i + 1].astype(np.float64)
            out[ti, :, 2 * i] = x0 * c - x1 * s
            out[ti, :, 2 * i + 1] = x0 * s + x1 * c
    return out


def softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def forward(weights, tokens, n_past, kv_k, kv_v, n_head, n_rot):
    """weights: dict with tok_embeddings [V,D], norm [D], output [D,V] and per
    layer l: {attention_norm, wq/wk/wv/wo [D,D] (as [in,out] matmul RHS),
    ffn_norm, w1 [D,F], w2 [F,D], w3 [D,F]}.
    kv_k/kv_v: [L, S, H, hd] mutated in place. Returns logits [T, V]."""
    tokens = np.asarray(tokens)
    t = len(tokens)
    d = weights["tok_embeddings"].shape[1]
    h = n_head
    hd = d // h
    positions = n_past + np.arange(t)

    x = weights["tok_embeddings"][tokens].astype(np.float64)
    n_layer = len(weights["layers"])
    for li in range(n_layer):
        lw = weights["layers"][li]
        cur = rms_norm(x, lw["attention_norm"])
        q = (cur @ lw["wq"]).reshape(t, h, hd)
        k = (cur @ lw["wk"]).reshape(t, h, hd)
        v = (cur @ lw["wv"]).reshape(t, h, hd)
        q = rope_interleaved(q, positions, n_rot)
        k = rope_interleaved(k, positions, n_rot)

        kv_k[li, n_past:n_past + t] = k
        kv_v[li, n_past:n_past + t] = v

        n_tot = n_past + t
        keys = kv_k[li, :n_tot]          # [S', H, hd]
        vals = kv_v[li, :n_tot]

        scores = np.einsum("thd,shd->hts", q, keys) / np.sqrt(hd)
        mask = np.arange(n_tot)[None, None, :] <= positions[None, :, None]
        scores = np.where(mask, scores, -np.inf)
        probs = softmax(scores, axis=-1)
        ctx = np.einsum("hts,shd->thd", probs, vals).reshape(t, d)
        x = x + ctx @ lw["wo"]

        cur = rms_norm(x, lw["ffn_norm"])
        gate = cur @ lw["w1"]
        up = cur @ lw["w3"]
        silu = gate / (1.0 + np.exp(-gate))
        x = x + (silu * up) @ lw["w2"]

    x = rms_norm(x, weights["norm"])
    return x @ weights["output"]


def make_tiny_weights(rng, n_vocab=64, n_embd=32, n_head=4, n_layer=2, n_ff=48):
    def w(*shape, scale=0.08):
        return (rng.standard_normal(shape) * scale).astype(np.float32)
    layers = []
    for _ in range(n_layer):
        layers.append(dict(
            attention_norm=1.0 + w(n_embd, scale=0.02),
            wq=w(n_embd, n_embd), wk=w(n_embd, n_embd),
            wv=w(n_embd, n_embd), wo=w(n_embd, n_embd),
            ffn_norm=1.0 + w(n_embd, scale=0.02),
            w1=w(n_embd, n_ff), w2=w(n_ff, n_embd), w3=w(n_embd, n_ff),
        ))
    return dict(
        tok_embeddings=w(n_vocab, n_embd, scale=0.5),
        norm=1.0 + w(n_embd, scale=0.02),
        output=w(n_embd, n_vocab),
        layers=layers,
    )
