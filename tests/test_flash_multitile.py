"""General (multi-KV-tile) flash path coverage — forced small blocks so the
online-softmax accumulation and the two-kernel backward are exercised (the
default blocks route T<=256 through the single-tile fast path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu.ops import basic
from vitrs_tpu.ops.flash_attention import flash_attention_qkv


def _qkv(B, T, C, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, T, 3 * C), dtype=np.float32))


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("T", [256, 300])
def test_multitile_forward(causal, T):
    qkv = _qkv(1, T, 64, seed=T)
    got = flash_attention_qkv(qkv, 2, causal=causal, block_q=128, block_k=128,
                              interpret=True)
    want, _ = basic.attention_dense(qkv, 2, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
def test_multitile_grads(causal):
    qkv = _qkv(1, 300, 32, seed=5)

    def lf(x):
        return jnp.sum(jnp.sin(flash_attention_qkv(
            x, 2, causal=causal, block_q=128, block_k=128, interpret=True)))

    def ld(x):
        return jnp.sum(jnp.sin(basic.attention_dense(x, 2, causal=causal)[0]))

    np.testing.assert_allclose(np.asarray(jax.grad(lf)(qkv)),
                               np.asarray(jax.grad(ld)(qkv)),
                               rtol=5e-4, atol=5e-5)


def test_single_and_multi_tile_agree():
    """Same inputs through both code paths must agree with each other."""
    qkv = _qkv(2, 256, 64, seed=9)
    single = flash_attention_qkv(qkv, 2, causal=True, interpret=True)
    multi = flash_attention_qkv(qkv, 2, causal=True, block_q=128, block_k=128,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(single), np.asarray(multi),
                               rtol=2e-5, atol=2e-5)
