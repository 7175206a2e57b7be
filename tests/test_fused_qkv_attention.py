"""Fused qkv-projection+attention op vs the plain composition — values and
all three gradients, interpret mode, single- and multi-tile, causal/bidir."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu.ops import basic
from vitrs_tpu.ops.fused_qkv_attention import qkv_attention


def _setup(B, T, C, seed=0):
    rng = np.random.default_rng(seed)
    ln1 = jnp.asarray(rng.standard_normal((B, T, C), dtype=np.float32))
    qkvw = jnp.asarray(rng.standard_normal((3 * C, C), dtype=np.float32) * 0.1)
    qkvb = jnp.asarray(rng.standard_normal(3 * C, dtype=np.float32) * 0.1)
    return ln1, qkvw, qkvb


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("T", [197, 300])
def test_fused_matches_composition(causal, T):
    NH, C = 2, 128    # head_dim 64 — the supported packed-kernel geometry
    ln1, qkvw, qkvb = _setup(1, T, C, seed=T)

    def fused(ln1, w, b):
        return qkv_attention(ln1, w, b, NH, causal, True)

    def plain(ln1, w, b):
        qkv = basic.linear(ln1, w, b)
        out, _ = basic.attention_dense(qkv, NH, causal=causal)
        return out

    got = fused(ln1, qkvw, qkvb)
    want = plain(ln1, qkvw, qkvb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a)))

    g_f = jax.grad(loss(fused), argnums=(0, 1, 2))(ln1, qkvw, qkvb)
    g_p = jax.grad(loss(plain), argnums=(0, 1, 2))(ln1, qkvw, qkvb)
    for gf, gp, name in zip(g_f, g_p, ("dln1", "dqkvw", "dqkvb")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                                   rtol=1e-3, atol=2e-4, err_msg=name)
