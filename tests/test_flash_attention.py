"""Flash attention kernel vs the dense oracle — interpret mode on CPU
(SURVEY.md §7 stage 3: 'interpret-mode test vs oracle, then compiled test';
the compiled-on-TPU path is exercised by bench.py and the TPU drive).

Covers: causal + bidirectional, padded sequence lengths (197 → 256, the
ViT-B/16 token count), head_dim 64, gradients via custom_vjp vs jax.grad of
the dense path, and bf16 inputs.

All geometries use head_dim 64 so `supports()` passes and the Pallas kernel
actually runs (head_dim 16/32 with 2 heads silently falls back to the dense
path — each parametrized class asserts support up front)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu.ops import basic
from vitrs_tpu.ops.flash_attention import (flash_attention,
                                           flash_attention_qkv, supports)


def _qkv(B, T, C, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((B, T, 3 * C), dtype=np.float32).astype(dtype)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("T", [128, 197, 256])
def test_flash_forward_matches_dense(causal, T):
    B, C, NH = 2, 128, 2
    assert supports(NH, C // NH)
    qkv = jnp.asarray(_qkv(B, T, C, seed=T))
    got = flash_attention_qkv(qkv, NH, causal=causal, interpret=True)
    want, _ = basic.attention_dense(qkv, NH, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_flash_grads_match_dense(causal):
    B, T, C, NH = 1, 197, 128, 2
    assert supports(NH, C // NH)
    qkv = jnp.asarray(_qkv(B, T, C, seed=7))

    def loss_flash(x):
        o = flash_attention_qkv(x, NH, causal=causal, interpret=True)
        return jnp.sum(jnp.sin(o))    # nontrivial cotangent
    def loss_dense(x):
        o, _ = basic.attention_dense(x, NH, causal=causal)
        return jnp.sum(jnp.sin(o))

    g_flash = jax.grad(loss_flash)(qkv)
    g_dense = jax.grad(loss_dense)(qkv)
    np.testing.assert_allclose(np.asarray(g_flash), np.asarray(g_dense),
                               rtol=5e-4, atol=5e-5)


def test_flash_head_dim_64_multi_head():
    """ViT-B geometry: head_dim 64, 12 heads (scaled down batch/seq)."""
    B, T, C, NH = 1, 128, 768, 12
    assert supports(NH, C // NH)
    qkv = jnp.asarray(_qkv(B, T, C, seed=3))
    got = flash_attention_qkv(qkv, NH, causal=False, interpret=True)
    want, _ = basic.attention_dense(qkv, NH, causal=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16_inputs():
    B, T, C, NH = 1, 128, 128, 2
    assert supports(NH, C // NH)
    qkv32 = _qkv(B, T, C, seed=5)
    got = flash_attention_qkv(jnp.asarray(qkv32, jnp.bfloat16), NH,
                              causal=False, interpret=True)
    want, _ = basic.attention_dense(jnp.asarray(qkv32), NH, causal=False)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)


def test_flash_4d_entry():
    B, H, T, D = 2, 2, 130, 64   # ragged T exercises padding
    assert supports(H, D)
    rng = np.random.default_rng(9)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, T, D), dtype=np.float32))
               for _ in range(3))
    got = flash_attention(q, k, v, causal=True, interpret=True)
    scale = 1.0 / np.sqrt(D)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    mask = jnp.tril(jnp.ones((T, T), bool))
    s = jnp.where(mask, s, -jnp.inf)
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
