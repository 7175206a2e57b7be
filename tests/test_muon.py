"""Muon optimizer (ops/muon.py): Newton-Schulz orthogonalization property,
hybrid split policy, training convergence, and a head-to-head convergence
check vs AdamW at matched step counts (Muon's raison d'être)."""

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.models import model as M
from vitrs_tpu.ops import muon
from vitrs_tpu.ops import optimizer as opt

CFG = get_config("gpt-nano", use_flash=False)


def test_newton_schulz_orthogonalizes():
    rng = np.random.default_rng(0)
    # ill-conditioned input: singular values spread over two decades
    u, _ = np.linalg.qr(rng.standard_normal((32, 32)))
    vt, _ = np.linalg.qr(rng.standard_normal((48, 48)))
    s = np.geomspace(0.01, 1.0, 32)
    g = (u * s) @ vt[:32]                                    # (32, 48)
    o = np.asarray(muon.newton_schulz5(jnp.asarray(g, jnp.float32)),
                   np.float32)
    sv = np.linalg.svd(o, compute_uv=False)
    # input far from orthogonal; output singular values near 1
    assert s.min() < 0.05
    assert sv.min() > 0.3 and sv.max() < 1.6, sv
    assert np.median(sv) > 0.7


def test_newton_schulz_batched_stacked_layout():
    rng = np.random.default_rng(1)
    g = jnp.asarray(rng.standard_normal((3, 16, 24)), jnp.float32)  # (L,OC,IC)
    o = muon.newton_schulz5(g)
    assert o.shape == g.shape
    # batched result equals per-slice results
    for l in range(3):
        np.testing.assert_allclose(np.asarray(o[l]),
                                   np.asarray(muon.newton_schulz5(g[l])),
                                   rtol=2e-2, atol=2e-2)


def test_split_policy():
    params = PRM.init_params(CFG, jax.random.PRNGKey(0))
    mu, rest = muon.split_muon(params)
    assert set(mu) == {"qkvw", "attprojw", "fcw", "fcprojw"}
    assert "wte" in rest and "ln1w" in rest and "qkvb" in rest


def test_muon_training_decreases_loss():
    params = PRM.init_params(CFG, jax.random.PRNGKey(1))
    state = muon.init_state(params)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 16)))
    y = jnp.asarray(np.roll(np.asarray(x), -1, axis=1))
    losses = []
    for s in range(12):
        loss, params, state = muon.muon_train_step(
            params, state, jnp.asarray(s), x, y, CFG, lr=0.02)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_muon_beats_or_matches_adamw_short_horizon():
    """On a tiny overfitting task at matched steps, hybrid Muon should reach
    a loss at least comparable to tuned AdamW (within 10%) — a weak but
    deterministic proxy for its convergence advantage."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(0, CFG.vocab_size, (4, 16)))
    y = jnp.asarray(np.roll(np.asarray(x), -1, axis=1))
    steps = 30

    p_m = PRM.init_params(CFG, jax.random.PRNGKey(2))
    st = muon.init_state(p_m)
    for s in range(steps):
        lm, p_m, st = muon.muon_train_step(p_m, st, jnp.asarray(s), x, y,
                                           CFG, lr=0.02)

    p_a = PRM.init_params(CFG, jax.random.PRNGKey(2))
    m = jax.tree_util.tree_map(jnp.zeros_like, p_a)
    v = jax.tree_util.tree_map(jnp.zeros_like, p_a)

    @jax.jit
    def astep(p, m, v, s):
        loss, g = jax.value_and_grad(M.loss_fn)(p, x, y, CFG)
        p, m, v = opt.adamw_tree(p, g, m, v, s + 1, 3e-3)
        return loss, p, m, v

    for s in range(steps):
        la, p_a, m, v = astep(p_a, m, v, jnp.asarray(s))
    assert float(lm) < float(la) * 1.10, (float(lm), float(la))


def test_dp_muon_step_matches_single_device():
    """The shard_map DP Muon step must equal a single-device step on the
    full batch (pmean'd tree grads == full-batch grads)."""
    from vitrs_tpu.parallel import data_parallel as dp
    mesh = dp.make_mesh(4)
    params = PRM.init_params(CFG, jax.random.PRNGKey(4))
    state = muon.init_state(params)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, CFG.vocab_size, (8, 16)))
    y = jnp.asarray(np.roll(np.asarray(x), -1, axis=1))

    # single-device reference FIRST: the dp step donates its (replicated)
    # inputs, which on a CPU mesh alias the original buffers
    loss, g = jax.value_and_grad(M.loss_fn)(params, x, y, CFG)
    gn = jnp.sqrt(sum(jnp.sum(jnp.square(t.astype(jnp.float32)))
                      for t in jax.tree_util.tree_leaves(g)))
    g = jax.tree_util.tree_map(
        lambda t: t * jnp.minimum(1.0, 1.0 / (gn + 1e-6)), g)
    p_1, st_1 = muon.step(params, g, state, jnp.asarray(1), 0.02,
                          adamw_lr=6e-4)
    p_1 = jax.device_get(p_1)

    step_fn = dp.make_dp_train_step_muon(CFG, mesh, clip_norm=1.0)
    p_dp, st_dp, loss_dp = step_fn(
        dp.replicate(params, mesh),
        dp.replicate(state, mesh),
        dp.shard_batch(x, mesh), dp.shard_batch(y, mesh),
        jnp.asarray(0, jnp.int32), jnp.asarray(0.02, jnp.float32),
        jnp.asarray(6e-4, jnp.float32))
    np.testing.assert_allclose(float(loss_dp), float(loss), rtol=1e-6)
    for k in p_1:
        # the bf16 Newton-Schulz chain amplifies the fp32 reduction-order
        # difference between pmean-of-shard-means and the full-batch mean;
        # observed ~2e-5 on a ~2e-3 update — a wiring error would be O(update)
        np.testing.assert_allclose(np.asarray(p_dp[k]), np.asarray(p_1[k]),
                                   rtol=2e-3, atol=5e-5, err_msg=k)


def test_train_loop_muon_resume_bit_exact(tmp_path):
    """Kill-and-resume under --optimizer muon: the side-tree state (incl.
    the data cursor riding its meta) must make 3+3 == 6 straight steps."""
    import os
    from vitrs_tpu import checkpoint as C
    from vitrs_tpu.train.loop import TrainConfig, train
    common = dict(preset="gpt-nano", dataset="tokens", steps=4,
                  batch_size=8, lr=0.02, warmup=2, dtype="float32",
                  log_every=2, eval_every=0, seed=3, optimizer="muon",
                  muon_adamw_lr=1e-3, clip_norm=1.0, async_ckpt=False,
                  model_overrides=dict(use_flash=False))
    w1 = str(tmp_path / "straight")
    train(TrainConfig(workdir=w1, ckpt_every=4, **common))
    w2 = str(tmp_path / "resumed")
    train(TrainConfig(workdir=w2, ckpt_every=2, run_steps=2, **common))
    train(TrainConfig(workdir=w2, ckpt_every=2, **common))
    p1, _, _ = C.load_checkpoint(os.path.join(w1, "ckpt_00000004.bin"))
    p2, _, _ = C.load_checkpoint(os.path.join(w2, "ckpt_00000004.bin"))
    for k in p1:
        np.testing.assert_allclose(p1[k], p2[k], rtol=2e-6, atol=1e-7,
                                   err_msg=k)


def test_muon_composes_with_gqa_rope_window():
    cfg = get_config("gpt-nano", use_flash=False, num_heads=4, channels=32,
                     num_kv_heads=2, pos_emb="rope", window=6)
    params = PRM.init_params(cfg, jax.random.PRNGKey(3))
    state = muon.init_state(params)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)))
    y = jnp.asarray(np.roll(np.asarray(x), -1, axis=1))
    l0, params, state = muon.muon_train_step(params, state, jnp.asarray(0),
                                             x, y, cfg, lr=0.02)
    l1, params, state = muon.muon_train_step(params, state, jnp.asarray(1),
                                             x, y, cfg, lr=0.02)
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
