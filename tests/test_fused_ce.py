"""Fused large-vocab CE (ops/fused_ce.py) vs the dense XLA reference.

Covers the Pallas forward in interpret mode, both backward variants (the
production jnp form XLA fuses, and the materializing Pallas kernel), the
vocab-pad masking, and the padded-head gpt_loss equivalence — the padded
lane-aligned lm_head (llm.c's 50304 pad) must produce the same loss and
gradients as the unpadded ragged head (reference CE semantics,
rusty_vit.rs:836-843).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu.ops import basic, fused_ce

V = 50257
VP = fused_ce.pad_vocab(V)
R = 64


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(R, V)).astype(np.float32)) * 4.0
    tgt = jnp.asarray(rng.integers(0, V, (R,)))
    return logits, tgt


def _pad(l):
    return jnp.pad(l, ((0, 0), (0, VP - V)))


def test_pad_vocab():
    assert fused_ce.pad_vocab(50257) == 50304          # llm.c's own pad
    assert fused_ce.pad_vocab(50304) == 50304
    assert fused_ce.supports(R, VP)
    assert not fused_ce.supports(R, VP - 1)            # ragged rejected
    assert not fused_ce.supports(R + 1, VP)
    assert not fused_ce.supports(R, 1000)              # ViT heads stay on XLA


def test_forward_matches_dense(data):
    logits, tgt = data
    ref = basic.cross_entropy_from_logits(logits, tgt)
    got = fused_ce.cross_entropy_rows(_pad(logits), tgt, V, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6,
                               atol=2e-6)


def test_pad_columns_masked(data):
    """Garbage (not zero) in the pad columns must not change the loss."""
    logits, tgt = data
    junk = _pad(logits).at[:, V:].set(1e4)
    ref = basic.cross_entropy_from_logits(logits, tgt)
    got = fused_ce.cross_entropy_rows(junk, tgt, V, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-6,
                               atol=2e-6)


def _grad_pair(data, pallas_bwd):
    logits, tgt = data
    f_ref = lambda l: jnp.mean(basic.cross_entropy_from_logits(l, tgt))
    f_new = lambda l: jnp.mean(
        fused_ce.cross_entropy_rows(_pad(l), tgt, V, True))
    old = fused_ce.PALLAS_BWD
    fused_ce.PALLAS_BWD = pallas_bwd
    try:
        g_new = jax.grad(f_new)(logits)
    finally:
        fused_ce.PALLAS_BWD = old
    return jax.grad(f_ref)(logits), g_new


@pytest.mark.parametrize("pallas_bwd", [False, True],
                         ids=["jnp-bwd", "pallas-bwd"])
def test_backward_matches_dense(data, pallas_bwd):
    g_ref, g_new = _grad_pair(data, pallas_bwd)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-7)


def test_mean_fallback_small_shapes(data):
    """Unsupported geometries route to the dense XLA path, same value."""
    logits, tgt = data
    small = logits[:8, :1000]
    ref = jnp.mean(basic.cross_entropy_from_logits(small, tgt[:8] % 1000))
    got = fused_ce.cross_entropy_mean(small, tgt[:8] % 1000)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_gpt_loss_padded_equals_unpadded():
    """gpt_loss's padded lane-aligned head == the plain ragged head.

    The fused branch is TPU-gated, so compare its padded-math form directly
    against model.gpt_loss on CPU: pad wte with zeros, mask pad columns, CE
    over VP — must equal CE over V (pad logits sit at zero weight rows and
    are masked out of the logsumexp).
    """
    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    from vitrs_tpu.models import model as M

    cfg = get_config("gpt-nano").replace(vocab_size=V)
    key = jax.random.PRNGKey(0)
    params = PRM.init_params(cfg, key)
    B, T = 2, 16
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, V, (B, T)))
    y = jnp.asarray(rng.integers(0, V, (B, T)))

    ref_loss, ref_grads = jax.value_and_grad(M.gpt_loss)(params, x, y, cfg)

    def padded_loss(p, x, y, cfg):
        lnf = M.gpt_trunk(p, x, cfg)
        wte_p = jnp.pad(p["wte"].astype(lnf.dtype), ((0, VP - V), (0, 0)))
        logits = basic.linear(lnf, wte_p, None)
        return fused_ce.cross_entropy_mean(logits, y, real_vocab=V,
                                           interpret=True)

    got_loss, got_grads = jax.value_and_grad(padded_loss)(params, x, y, cfg)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-6)
    for k in ref_grads:
        np.testing.assert_allclose(
            np.asarray(got_grads[k]), np.asarray(ref_grads[k]),
            rtol=2e-5, atol=1e-6, err_msg=k)
