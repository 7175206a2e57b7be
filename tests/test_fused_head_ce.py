"""Fused lm-head matmul + CE epilogue (ops/fused_head_ce.py): exact-value
parity of the online-lse epilogue and both gradients against the plain
logsumexp composition, interpret-mode Pallas on CPU (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu.ops import fused_head_ce as FH


@pytest.fixture(autouse=True)
def _small_blocks(monkeypatch):
    """Shrink the production tile sizes so tiny geometries exercise multiple
    grid cells (2 row panels x 3 vocab tiles) in interpret mode."""
    monkeypatch.setattr(FH, "BLOCK_R", 8)
    monkeypatch.setattr(FH, "BLOCK_V", 128)


def _ref_loss(lnf, w, tgt, V):
    logits = lnf @ w.T
    lse = jax.scipy.special.logsumexp(logits[:, :V], axis=-1)
    return jnp.mean(lse - logits[jnp.arange(lnf.shape[0]), tgt])


def test_fwd_matches_logsumexp_composition():
    R, C, Vp, V = 16, 128, 384, 300
    lnf = jax.random.normal(jax.random.PRNGKey(0), (R, C)) * 0.5
    w = jax.random.normal(jax.random.PRNGKey(1), (Vp, C)) * 0.05
    w = w.at[V:].set(0.0)   # pad rows, like gpt_loss's jnp.pad
    tgt = jax.random.randint(jax.random.PRNGKey(2), (R,), 0, V)
    loss = FH.head_ce_mean(lnf, w, tgt, V, True)
    np.testing.assert_allclose(float(loss), float(_ref_loss(lnf, w, tgt, V)),
                               rtol=1e-6)


def test_grads_match_composition():
    R, C, Vp, V = 16, 128, 384, 300
    lnf = jax.random.normal(jax.random.PRNGKey(3), (R, C)) * 0.5
    w = jax.random.normal(jax.random.PRNGKey(4), (Vp, C)) * 0.05
    tgt = jax.random.randint(jax.random.PRNGKey(5), (R,), 0, V)
    g = jax.grad(lambda a, b: FH.head_ce_mean(a, b, tgt, V, True),
                 argnums=(0, 1))(lnf, w)
    gr = jax.grad(_ref_loss, argnums=(0, 1))(lnf, w, tgt, V)
    np.testing.assert_allclose(np.asarray(g[0]), np.asarray(gr[0]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(g[1]), np.asarray(gr[1]),
                               rtol=1e-5, atol=1e-7)
    # pad-column gradient must be exactly the masked softmax rows (zero
    # probability past real_vocab -> zero grad for untouched pad rows is NOT
    # expected here because dw rows beyond V still receive -onehot*0 + p*x
    # contributions only through p, which is masked to 0)
    assert float(jnp.max(jnp.abs(np.asarray(g[1])[V:]))) == 0.0


def test_batched_shape_and_bf16():
    """(B, T, C) input path at bf16 logits — the production calling form."""
    B, T, C, Vp, V = 2, 8, 128, 384, 384
    lnf = (jax.random.normal(jax.random.PRNGKey(6), (B, T, C))
           * 0.5).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(7), (Vp, C))
         * 0.05).astype(jnp.bfloat16)
    tgt = jax.random.randint(jax.random.PRNGKey(8), (B, T), 0, V)
    loss = FH.head_ce_mean(lnf, w, tgt, V, True)
    ref = _ref_loss(lnf.reshape(-1, C).astype(jnp.float32),
                    w.astype(jnp.float32), tgt.reshape(-1), V)
    # bf16 matmul inputs, fp32 accumulate: agreement to bf16 resolution
    np.testing.assert_allclose(float(loss), float(ref), rtol=2e-2)
    g = jax.grad(lambda a: FH.head_ce_mean(a, w, tgt, V, True))(lnf)
    assert g.shape == lnf.shape and np.isfinite(
        np.asarray(g, np.float32)).all()


def test_supports_gate():
    assert FH.supports(16, 384, 128)          # with the shrunk test blocks
    assert not FH.supports(17, 384, 128)      # ragged rows
    assert not FH.supports(16, 385, 128)      # ragged vocab
    import importlib
    prod = importlib.reload(FH)
    try:
        assert prod.supports(32 * 1024, 50304, 768)   # GPT-2 124M B=32
        assert prod.supports(16 * 1024, 50304, 768)
        assert not prod.supports(2 * 16, 50304, 768)  # tiny test batches
    finally:
        importlib.reload(prod)
