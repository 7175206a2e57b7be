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


def test_adamw_tree_decay_mask_2d():
    """decay_mask_2d: only matrix-shaped leaves feel weight decay (the
    llm.c policy); with zero grads, masked 1-D leaves must be unchanged."""
    import jax, jax.numpy as jnp, numpy as np
    from vitrs_tpu.ops import optimizer as opt
    p = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    g = jax.tree.map(jnp.zeros_like, p)
    m = jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), p)
    v = jax.tree.map(lambda x: jnp.zeros(x.shape, jnp.float32), p)
    mask = opt.decay_mask_2d(p)
    assert mask == {"w": True, "b": False}
    p2, _, _ = opt.adamw_tree(p, g, m, v, jnp.asarray(1, jnp.int32),
                              jnp.asarray(0.1, jnp.float32),
                              weight_decay=0.5, decay_mask=mask)
    np.testing.assert_array_equal(np.asarray(p2["b"]), np.ones(4))
    assert np.all(np.asarray(p2["w"]) < 1.0)


def test_dp_step_decay_2d_only_matches_tree_form():
    """The flat ZeRO-1 decomposition (kernel wd=0 + masked decoupled term)
    must equal the masked tree-form AdamW exactly."""
    import jax, jax.numpy as jnp, numpy as np
    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    from vitrs_tpu.models import model as M
    from vitrs_tpu.ops import optimizer as opt
    from vitrs_tpu.parallel import data_parallel as dp
    cfg = get_config("gpt-nano", use_flash=False, dtype="float32")
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B = 16
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, cfg.max_seq_len)))
    y = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, cfg.max_seq_len)))
    s = (jnp.asarray(1, jnp.int32), jnp.asarray(1e-3, jnp.float32),
         jnp.asarray(0.1, jnp.float32))

    # reference first: the dp step donates its (replicated) param buffers
    zeros = lambda: jax.tree.map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params)
    loss, g = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)
    p_ref, _, _ = opt.adamw_tree(params, g, zeros(), zeros(), s[0], s[1],
                                 weight_decay=0.1,
                                 decay_mask=opt.decay_mask_2d(params))
    p_ref = jax.device_get(p_ref)

    mesh = dp.make_mesh(8)
    m0, v0 = dp.init_sharded_opt_state(cfg, mesh)
    step = dp.make_dp_train_step(cfg, mesh, decay_2d_only=True)
    p_dp, _, _, _ = step(dp.replicate(params, mesh), m0, v0,
                         dp.shard_batch(x, mesh), dp.shard_batch(y, mesh),
                         *s)
    for k in p_ref:
        np.testing.assert_allclose(np.asarray(p_dp[k]), np.asarray(p_ref[k]),
                                   rtol=2e-6, atol=1e-7, err_msg=k)
