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


def _fused_oracle(qkv, kc, vc, n_past, n_rot):
    """Unfused reference: split + rope + cache write + masked attention."""
    import math
    from fastllama_tpu.kernels.rope import rope_interleaved

    b, s, f = kc.shape
    hd = n_rot
    h = f // hd
    q = qkv[..., :f].reshape(b, 1, h, hd)
    k = qkv[..., f:2 * f].reshape(b, 1, h, hd)
    v = qkv[..., 2 * f:].reshape(b, 1, h, hd)
    pos = n_past[:, None]
    qr = rope_interleaved(q, pos, n_rot)
    kr = rope_interleaved(k, pos, n_rot)
    kc = kc.at[jnp.arange(b)[:, None], pos].set(kr.reshape(b, 1, f))
    vc = vc.at[jnp.arange(b)[:, None], pos].set(v.reshape(b, 1, f))
    keys = kc.reshape(b, s, h, hd)
    vals = vc.reshape(b, s, h, hd)
    scores = jnp.einsum("bthd,bshd->bhts", qr, keys) / math.sqrt(hd)
    mask = jnp.arange(s)[None, None, None, :] <= pos[:, None, :, None]
    probs = jax.nn.softmax(jnp.where(mask, scores, -1e30), axis=-1)
    ctx = jnp.einsum("bhts,bshd->bthd", probs, vals).reshape(b, 1, f)
    return ctx, kc, vc


@pytest.mark.parametrize("wide", [False, True])
def test_fused_rope_write_attention(wide):
    """The fully-fused decode kernel (rope + in-place KV write + attention,
    kernels/decode_attention.decode_attention_fused) must match the unfused
    split_qkv -> rope_interleaved -> scatter -> masked-softmax chain."""
    import math
    from fastllama_tpu.kernels.decode_attention import (
        decode_attention_fused, rope_lane_tables)

    rng = np.random.default_rng(7)
    b, s, h, hd = 3, 128, 2, 128
    f = h * hd
    n_past = jnp.asarray([5, 0, 127], jnp.int32)
    kc = jnp.asarray(rng.standard_normal((b, s, f)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((b, s, f)), jnp.float32)
    qkv = jnp.asarray(rng.standard_normal((b, 1, 3 * f)), jnp.float32)

    ctx_ref, kc_ref, vc_ref = _fused_oracle(qkv, kc, vc, n_past, hd)
    cos, sin = rope_lane_tables(n_past, hd, hd)
    ctx, kcn, vcn = decode_attention_fused(
        qkv, kc, vc, n_past, cos, sin, head_dim=hd, n_rot=hd,
        scale=1.0 / math.sqrt(hd), interpret=True, wide=wide)

    np.testing.assert_allclose(np.asarray(ctx), np.asarray(ctx_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(kcn), np.asarray(kc_ref),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(vcn), np.asarray(vc_ref))


def test_rope_lane_tables_match_rope_interleaved():
    """Per-lane tables must reproduce rope_interleaved exactly, including
    partial rotation (n_rot < head_dim)."""
    from fastllama_tpu.kernels.decode_attention import rope_lane_tables
    from fastllama_tpu.kernels.rope import rope_interleaved

    rng = np.random.default_rng(3)
    b, hd, n_rot = 4, 128, 64
    x = jnp.asarray(rng.standard_normal((b, 1, 1, hd)), jnp.float32)
    pos = jnp.asarray([0, 1, 17, 300], jnp.int32)
    want = np.asarray(rope_interleaved(x, pos[:, None], n_rot))[:, 0, 0]

    cos, sin = rope_lane_tables(pos, hd, n_rot)
    xl = np.asarray(x)[:, 0, 0]
    partner = xl.copy()
    partner[:, 0:n_rot:2] = xl[:, 1:n_rot:2]
    partner[:, 1:n_rot:2] = xl[:, 0:n_rot:2]
    got = xl * np.asarray(cos) + partner * np.asarray(sin)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
