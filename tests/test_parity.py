"""Tier-(b) parity tests: the JAX model vs the NumPy reference oracle
(SURVEY.md §4 'strengthen tier (b) into fp32 parity vs a reference oracle'),
plus finite-difference gradient checks at tiny config (L=2, C=16, T=8, V=97).

fp32 summation order differs between scalar loops and XLA reductions, so the
parity policy is tight-tolerance at tiny scale (SURVEY.md §7 'Hard parts')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu import params as P
from vitrs_tpu.config import get_config
from vitrs_tpu.models import model as M
from vitrs_tpu.oracle import numpy_ref as oracle

CFG = get_config("gpt-nano", use_flash=False)
CFG_Q = CFG.replace(quirks=True)


@pytest.fixture(scope="module")
def setup():
    cfg = CFG
    shapes = P.param_shapes(cfg)
    np_params = oracle.init_parameters(shapes, seed=7)
    params = {k: jnp.asarray(v) for k, v in np_params.items()}
    rng = np.random.default_rng(11)
    B, T = 2, 8
    tokens = rng.integers(0, cfg.vocab_size, (B, T))
    targets = rng.integers(0, cfg.vocab_size, (B, T))
    return cfg, np_params, params, tokens, targets


def test_forward_loss_parity_corrected(setup):
    """Production math (quirks=False) vs oracle corrected mode."""
    cfg, np_params, params, tokens, targets = setup
    want, _ = oracle.model_forward(np_params, tokens, targets, cfg.num_heads,
                                   quirks=False)
    got = float(M.gpt_loss(params, jnp.asarray(tokens), jnp.asarray(targets), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_forward_loss_parity_quirks(setup):
    """Reference-as-written math (G5/G6/G11) vs oracle quirks mode."""
    cfg, np_params, params, tokens, targets = setup
    want, _ = oracle.model_forward(np_params, tokens, targets, cfg.num_heads,
                                   quirks=True)
    got = float(M.gpt_loss(params, jnp.asarray(tokens), jnp.asarray(targets),
                           CFG_Q))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_logits_parity(setup):
    cfg, np_params, params, tokens, targets = setup
    _, acts = oracle.model_forward(np_params, tokens, targets, cfg.num_heads)
    got = np.asarray(M.gpt_forward(params, jnp.asarray(tokens), cfg))
    np.testing.assert_allclose(got, acts["logits"], rtol=1e-4, atol=1e-5)


def test_inference_mode_sentinel(setup):
    """forward without targets → mean_loss == -1.0 (rusty_vit.rs:348-350)."""
    cfg, np_params, params, tokens, _ = setup
    loss, acts = oracle.model_forward(np_params, tokens, None, cfg.num_heads)
    assert loss == -1.0
    assert np.all(np.isfinite(acts["probs"]))


def test_grad_parity_vs_oracle_backward(setup):
    """jax.grad of the production loss vs the oracle's hand-sequenced reverse
    pass (rusty_vit.rs:354-449 semantics) — all 16 tensors."""
    cfg, np_params, params, tokens, targets = setup
    _, acts = oracle.model_forward(np_params, tokens, targets, cfg.num_heads,
                                   quirks=False)
    want = oracle.model_backward(np_params, acts, tokens, targets, cfg.num_heads)
    got = jax.grad(M.gpt_loss)(params, jnp.asarray(tokens), jnp.asarray(targets),
                               cfg)
    for name in P.CANONICAL_16:
        g = np.asarray(got[name])
        w = want[name]
        scale = max(np.abs(w).max(), 1e-8)
        np.testing.assert_allclose(g, w, rtol=5e-4, atol=2e-5 * scale,
                                   err_msg=f"grad mismatch on {name}")


def test_grad_finite_difference():
    """Central-difference check on a handful of coordinates at fp64-ish
    tolerance (tiny config)."""
    cfg = get_config("gpt-nano", use_flash=False)
    shapes = P.param_shapes(cfg)
    np_params = oracle.init_parameters(shapes, seed=3)
    params = {k: jnp.asarray(v) for k, v in np_params.items()}
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 4)))
    targets = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 4)))

    grads = jax.grad(M.gpt_loss)(params, tokens, targets, cfg)
    eps = 1e-3
    for name, idx in [("qkvw", (0, 3, 5)), ("fcw", (1, 7, 2)), ("wte", (10, 3)),
                      ("ln1w", (0, 4)), ("lnfb", (2,)), ("attprojb", (1, 3))]:
        p_plus = dict(params)
        p_minus = dict(params)
        arr = np.array(np_params[name], np.float32)
        ap, am = arr.copy(), arr.copy()
        ap[idx] += eps
        am[idx] -= eps
        p_plus[name] = jnp.asarray(ap)
        p_minus[name] = jnp.asarray(am)
        lp = float(M.gpt_loss(p_plus, tokens, targets, cfg))
        lm = float(M.gpt_loss(p_minus, tokens, targets, cfg))
        fd = (lp - lm) / (2 * eps)
        an = float(np.asarray(grads[name])[idx])
        assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (name, idx, fd, an)


def test_vit_grad_finite_difference():
    """Same check through the vision path: patchify → blocks → head."""
    cfg = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
        num_layers=2, channels=16, num_heads=2, img_size=8, patch_size=4,
        max_seq_len=5)
    key = jax.random.PRNGKey(0)
    params = P.init_params(cfg, key)
    rng = np.random.default_rng(9)
    images = jnp.asarray(rng.standard_normal((2, 8, 8, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, (2,)))

    def loss(p):
        return M.vit_loss(p, images, labels, cfg, train=False)

    grads = jax.grad(loss)(params)
    eps = 1e-3
    for name, idx in [("patchw", (3, 7)), ("headw", (2, 5)), ("cls", (0, 0, 3)),
                      ("qkvw", (1, 4, 2)), ("wpe", (0, 3))]:
        arr = np.asarray(params[name], np.float64)
        ap, am = arr.copy(), arr.copy()
        ap[idx] += eps
        am[idx] -= eps
        lp = float(loss({**params, name: jnp.asarray(ap, jnp.float32)}))
        lm = float(loss({**params, name: jnp.asarray(am, jnp.float32)}))
        fd = (lp - lm) / (2 * eps)
        an = float(np.asarray(grads[name])[idx])
        assert abs(fd - an) < 5e-3 * max(1.0, abs(fd)), (name, idx, fd, an)
