"""Fused AdamW Pallas kernel vs the jnp reference update — interpret mode on
CPU (SURVEY.md §5.2: Pallas interpreter mode is the 'sanitizer' for custom
kernels before compiling to Mosaic)."""

import jax.numpy as jnp
import numpy as np

from vitrs_tpu.ops.fused_adamw import adamw_pallas
from vitrs_tpu.ops.optimizer import adamw_step_jnp, sgd_step


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n, dtype=np.float32),
            rng.standard_normal(n, dtype=np.float32) * 0.1,
            rng.standard_normal(n, dtype=np.float32) * 0.01,
            rng.random(n, dtype=np.float32) * 0.001)


def test_adamw_pallas_matches_jnp():
    n = 3000  # deliberately not a multiple of the 128-lane tile
    p, g, m, v = _rand(n, 0)
    step = jnp.asarray(3, jnp.int32)
    lr = jnp.asarray(1e-3, jnp.float32)
    want = adamw_step_jnp(jnp.asarray(p), jnp.asarray(g), jnp.asarray(m),
                          jnp.asarray(v), step, lr, weight_decay=0.1)
    got = adamw_pallas(jnp.asarray(p), jnp.asarray(g), jnp.asarray(m),
                       jnp.asarray(v), step, lr, weight_decay=0.1,
                       interpret=True)
    for w, gt, name in zip(want, got, ("p", "m", "v")):
        np.testing.assert_allclose(np.asarray(gt), np.asarray(w), rtol=2e-5,
                                   atol=1e-7, err_msg=name)
        assert gt.shape == (n,)


def test_adamw_pallas_first_step_bias_correction():
    """At t=1 with m=v=0 the update must be ±lr (up to eps) regardless of
    gradient magnitude — the classic bias-correction check."""
    n = 256
    rng = np.random.default_rng(1)
    g = rng.standard_normal(n, dtype=np.float32) * 100
    p = jnp.zeros(n)
    got_p, _, _ = adamw_pallas(p, jnp.asarray(g), jnp.zeros(n), jnp.zeros(n),
                               jnp.asarray(1, jnp.int32),
                               jnp.asarray(1e-3, jnp.float32), interpret=True)
    np.testing.assert_allclose(np.abs(np.asarray(got_p)), 1e-3, rtol=1e-3)


def test_sgd_reference_semantics():
    p, g, _, _ = _rand(100, 2)
    out = np.asarray(sgd_step(jnp.asarray(p), jnp.asarray(g), 0.5))
    np.testing.assert_allclose(out, p - 0.5 * g, rtol=1e-6)
