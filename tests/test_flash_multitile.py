"""General (multi-KV-tile) flash path coverage — forced small blocks so the
online-softmax accumulation and BOTH backward decompositions (combined
single-pass and two-kernel dKV/dQ) are exercised in interpret mode.

Geometries use head_dim 64 (C=128, NH=2) so `supports()` passes and the
Pallas kernels actually run — smaller head dims silently fall back to the
dense XLA path (round-1 versions of these tests compared dense against
itself; each test now asserts the kernel path is taken)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu.ops import basic
from vitrs_tpu.ops import flash_attention as fa
from vitrs_tpu.ops.flash_attention import flash_attention_qkv, supports

NH, C = 2, 128  # head_dim 64: 2 % (128 // 64) == 0 -> Pallas path taken


def _qkv(B, T, C, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((B, T, 3 * C), dtype=np.float32))


def test_geometry_takes_pallas_path():
    assert supports(NH, C // NH)
    assert not supports(2, 32), "old test geometry must NOT be reused"


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("T", [256, 300])
def test_multitile_forward(causal, T):
    qkv = _qkv(1, T, C, seed=T)
    got = flash_attention_qkv(qkv, NH, causal=causal, block_q=128,
                              block_k=128, interpret=True)
    want, _ = basic.attention_dense(qkv, NH, causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("combined", [True, False])
@pytest.mark.parametrize("causal", [True, False])
def test_multitile_grads(causal, combined, monkeypatch):
    """Both backward variants vs dense: combined single-pass (default for
    T<=4096 at D=64) and the two-kernel dKV/dQ pair (forced by zeroing the
    VMEM budget)."""
    if not combined:
        monkeypatch.setattr(fa, "COMBINED_BWD_VMEM_LIMIT", 0)
    qkv = _qkv(1, 300, C, seed=5)

    def lf(x):
        return jnp.sum(jnp.sin(flash_attention_qkv(
            x, NH, causal=causal, block_q=128, block_k=128, interpret=True)))

    def ld(x):
        return jnp.sum(jnp.sin(basic.attention_dense(x, NH, causal=causal)[0]))

    np.testing.assert_allclose(np.asarray(jax.grad(lf)(qkv)),
                               np.asarray(jax.grad(ld)(qkv)),
                               rtol=5e-4, atol=5e-5)


def test_single_and_multi_tile_agree():
    """Same inputs through both code paths must agree with each other."""
    qkv = _qkv(2, 256, C, seed=9)
    single = flash_attention_qkv(qkv, NH, causal=True, interpret=True)
    multi = flash_attention_qkv(qkv, NH, causal=True, block_q=128,
                                block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(single), np.asarray(multi),
                               rtol=2e-5, atol=2e-5)
