"""Fused decode-attention kernel vs the masked-einsum oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fastllama_tpu.kernels.decode_attention import (
    decode_attention, decode_attn_supported,
)


def oracle(q, k_cache, v_cache, n_past, scale):
    """The einsum decode path from models/llama._attention, t=1.
    q [B,H,D]; caches [B,S,H,D]."""
    qf = q.astype(jnp.float32)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scores = jnp.einsum("bhd,bshd->bhs", qf, kf,
                        precision=jax.lax.Precision.HIGHEST) * scale
    s = kf.shape[1]
    mask = jnp.arange(s)[None, None, :] <= n_past[:, None, None]
    scores = jnp.where(mask, scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhs,bshd->bhd", probs, vf,
                      precision=jax.lax.Precision.HIGHEST)


def run_kernel(q4, kc4, vc4, npast, scale):
    """4-D oracle shapes -> flat kernel layout -> 4-D result."""
    b, s, h, d = kc4.shape
    got = decode_attention(
        q4.reshape(b, 1, h * d), kc4.reshape(b, s, h * d),
        vc4.reshape(b, s, h * d), npast, head_dim=d, scale=scale,
        interpret=True)
    return np.asarray(got).reshape(b, h, d)


@pytest.mark.parametrize("b,s,h,d,n_past", [
    (1, 128, 4, 128, [0]),
    (1, 128, 4, 128, [127]),
    (3, 256, 2, 128, [0, 17, 255]),
    (4, 128, 1, 256, [5, 63, 64, 100]),
])
def test_matches_einsum_oracle(b, s, h, d, n_past):
    assert decode_attn_supported(s, d)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    kc = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    vc = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    npast = jnp.asarray(n_past, jnp.int32)
    scale = 1.0 / np.sqrt(d)

    got = run_kernel(q, kc, vc, npast, scale)
    want = oracle(q, kc, vc, npast, scale)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-5, atol=2e-5)


def test_bf16_cache():
    rng = np.random.default_rng(1)
    b, s, h, d = 2, 128, 2, 128
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    kc = jnp.asarray(rng.normal(size=(b, s, h, d))).astype(jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(b, s, h, d))).astype(jnp.bfloat16)
    npast = jnp.asarray([40, 127], jnp.int32)
    scale = 1.0 / np.sqrt(d)
    got = run_kernel(q, kc, vc, npast, scale)
    want = oracle(q, kc, vc, npast, scale)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-3, atol=2e-3)


def test_inactive_slot_is_finite():
    """Engine slots parked past n_ctx (position n_ctx+1) must not produce
    NaN/inf — their tokens are discarded but flow through sampling."""
    rng = np.random.default_rng(2)
    b, s, h, d = 2, 128, 2, 128
    q = jnp.asarray(rng.normal(size=(b, h, d)).astype(np.float32))
    kc = jnp.zeros((b, s, h, d), jnp.float32)
    vc = jnp.zeros((b, s, h, d), jnp.float32)
    npast = jnp.asarray([s + 1, 3], jnp.int32)
    got = run_kernel(q, kc, vc, npast, 0.088)
    assert np.isfinite(got).all()
