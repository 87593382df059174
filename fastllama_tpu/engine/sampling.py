"""Token sampling with the reference's exact semantics.

Re-implements sample_top_p_top_k (/root/reference/lib/bridge.cpp:24-108):

  1. greedy argmax when temp <= 0                        (bridge.cpp:39-42)
  2. scale logits by 1/temp; tokens present in the last-n window get the
     CTRL repetition penalty — multiply by `penalty` if the *raw* logit is
     negative, else divide                               (bridge.cpp:53-65)
  3. keep the top-k scaled logits                        (bridge.cpp:13-21)
  4. softmax over the kept set; truncate at the first cumulative
     probability >= top_p (inclusive)                    (bridge.cpp:72-102)
  5. draw from the renormalized distribution             (bridge.cpp:104-107)

Two implementations:
  * `sample_host` — numpy, used by the single-stream session (n_vocab=32k is
    host-trivial and keeps the RNG state picklable for session save/load,
    matching the reference's serialized mt19937, bridge.cpp:441-447).
  * `sample_jax` — jit-friendly batched version for the continuous-batching
    engine; identical selection semantics with jax.random draws.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Defaults follow interfaces/python/fastllama.py:344-349."""
    top_k: int = 40
    top_p: float = 0.95
    temp: float = 0.8
    repeat_penalty: float = 1.0


def apply_repetition_penalty(logits: np.ndarray, last_tokens,
                             temp: float, penalty: float) -> np.ndarray:
    """Return scaled logits with the CTRL penalty applied (f64, like the ref)."""
    scaled = logits.astype(np.float64) / float(temp)
    if penalty != 1.0 and len(last_tokens) > 0:
        idx = np.unique(np.asarray(list(last_tokens), dtype=np.int64))
        idx = idx[(idx >= 0) & (idx < logits.shape[-1])]
        neg = logits[idx] < 0.0
        scaled[idx] = np.where(neg, scaled[idx] * penalty, scaled[idx] / penalty)
    return scaled


def sample_host(logits: np.ndarray, last_tokens, params: SamplingParams,
                rng: np.random.Generator) -> int:
    """Sample one token id from [n_vocab] logits."""
    logits = np.asarray(logits, dtype=np.float32)
    n_vocab = logits.shape[-1]
    if params.temp <= 0.0:
        return int(np.argmax(logits))

    scaled = apply_repetition_penalty(logits, last_tokens, params.temp,
                                      params.repeat_penalty)

    k = params.top_k if params.top_k > 0 else n_vocab
    k = min(k, n_vocab)
    # top-k by scaled logit, descending (stable order irrelevant: draws are by
    # probability mass)
    part = np.argpartition(-scaled, k - 1)[:k]
    order = part[np.argsort(-scaled[part], kind="stable")]
    top = scaled[order]

    probs = np.exp(top - top[0])
    probs /= probs.sum()

    if params.top_p < 1.0:
        cum = np.cumsum(probs)
        cut = int(np.searchsorted(cum, params.top_p) + 1)
        probs = probs[:cut]
        order = order[:cut]
        probs = probs / probs.sum()

    choice = rng.choice(len(probs), p=probs)
    return int(order[choice])


def sample_jax(logits: jax.Array, last_tokens: jax.Array, key: jax.Array,
               top_k: int, top_p, temp, repeat_penalty,
               top_k_v: jax.Array | None = None) -> jax.Array:
    """Batched on-device sampler: logits [B, V], last_tokens [B, W] (pad with
    -1), key: a single PRNG key (the [B, k] gumbel draw is vectorized from
    it). Returns [B] int32.

    Serving engines need sampling knobs *per request* (the reference takes
    them per generate() call, bridge.cpp:240-312), so every knob except the
    top-k cap is vectorized over rows:

      top_k:          static cap (sets the jax.lax.top_k width under jit)
      top_k_v:        optional [B] int32 per-row k in [1, top_k]
      top_p:          python float or [B] f32
      temp:           python float or [B] f32 — rows with temp <= 0 decode
                      greedily from the raw logits (bridge.cpp:39-42)
      repeat_penalty: python float or [B] f32 (CTRL penalty over last_tokens)
    """
    b, v = logits.shape
    temp_v = jnp.broadcast_to(jnp.asarray(temp, jnp.float32), (b,))
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    scaled = logits.astype(jnp.float32) / jnp.maximum(temp_v, 1e-6)[:, None]

    static_rp = isinstance(repeat_penalty, (int, float))
    if not (static_rp and repeat_penalty == 1.0):
        rp_v = jnp.broadcast_to(
            jnp.asarray(repeat_penalty, jnp.float32), (b,))[:, None]
        oh = jax.nn.one_hot(jnp.clip(last_tokens, 0, v - 1), v, dtype=jnp.bool_)
        valid = (last_tokens >= 0)[..., None]
        in_window = jnp.any(oh & valid, axis=1)
        pen = jnp.where(logits < 0, scaled * rp_v, scaled / rp_v)
        scaled = jnp.where(in_window, pen, scaled)

    k = min(top_k if top_k > 0 else v, v)
    top_vals, top_idx = jax.lax.top_k(scaled, k)
    if top_k_v is not None:
        # per-row k: ranks past the row's k drop out before the softmax
        keep_k = jnp.arange(k)[None, :] < jnp.clip(top_k_v, 1, k)[:, None]
        top_vals = jnp.where(keep_k, top_vals, -jnp.inf)
    probs = jax.nn.softmax(top_vals, axis=-1)

    static_tp = isinstance(top_p, (int, float))
    if not (static_tp and top_p >= 1.0):
        tp_v = jnp.broadcast_to(jnp.asarray(top_p, jnp.float32), (b,))[:, None]
        cum = jnp.cumsum(probs, axis=-1)
        # keep entries whose *preceding* cumsum < top_p (inclusive cut)
        keep = jnp.concatenate(
            [jnp.ones((b, 1), jnp.bool_), cum[:, :-1] < tp_v], axis=-1)
        probs = jnp.where(keep, probs, 0.0)
        probs = probs / probs.sum(axis=-1, keepdims=True)

    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (b, k), minval=1e-20, maxval=1.0)))
    choice = jnp.argmax(jnp.where(probs > 0, jnp.log(probs) + gumbel,
                                  -jnp.inf), axis=-1)
    sampled = jnp.take_along_axis(
        top_idx, choice[:, None], axis=-1)[:, 0].astype(jnp.int32)
    return jnp.where(temp_v <= 0.0, greedy, sampled)
