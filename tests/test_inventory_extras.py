"""Completeness tests for reference inventory items outside the model path:
the dead-code dense softmax/crossentropy backwards (gap G12), gradient
accumulation, multi-host helpers, and train-loop resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu.oracle import numpy_ref as oracle
from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.parallel import data_parallel as dp
from vitrs_tpu.parallel import multihost


def test_softmax_backward_dense_matches_reference_semantics():
    """rusty_vit.rs:819-834 as written: dinp_i = p_i * sum(dout) - dout_i
    (note: NOT the true softmax Jacobian — dead code, reproduced verbatim)."""
    rng = np.random.default_rng(0)
    probs = oracle.softmax_forward(rng.standard_normal((2, 3, 7), np.float32))
    dout = rng.standard_normal((2, 3, 7), np.float32)
    got = oracle.softmax_backward_dense(dout, probs)
    # scalar-loop emulation
    want = np.zeros_like(dout)
    for b in range(2):
        for t in range(3):
            for i in range(7):
                for j in range(7):
                    ind = 1.0 if i == j else 0.0
                    want[b, t, i] += (probs[b, t, i] - ind) * dout[b, t, j]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_crossentropy_backward_dense_reference_semantics():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((1, 4, 5), np.float32)
    targets = rng.integers(0, 5, (1, 4))
    out = oracle.crossentropy_backward_dense(logits, targets)
    for t in range(4):
        for j in range(5):
            if j == targets[0, t]:
                assert out[0, t, j] == -logits[0, t, j]
            else:
                assert out[0, t, j] == 0.0


def test_gradient_accumulation_matches_full_batch():
    """accum_steps=4 must give (numerically) the same update as accum=1."""
    cfg = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
        num_layers=2, channels=32, num_heads=2)
    mesh = dp.make_mesh()
    rng = np.random.default_rng(0)
    B = 32
    images = jnp.asarray(rng.standard_normal((B, 32, 32, 3), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, 10, (B,)))
    args = lambda: (dp.replicate(PRM.init_params(cfg, jax.random.PRNGKey(0)),
                                 mesh),
                    *dp.init_sharded_opt_state(cfg, mesh),
                    dp.shard_batch(images, mesh), dp.shard_batch(labels, mesh),
                    jnp.asarray(1, jnp.int32), jnp.asarray(1e-3, jnp.float32),
                    jnp.asarray(0.0, jnp.float32))
    p1, m1, v1, loss1 = dp.make_dp_train_step(cfg, mesh, accum_steps=1)(*args())
    p4, m4, v4, loss4 = dp.make_dp_train_step(cfg, mesh, accum_steps=4)(*args())
    np.testing.assert_allclose(float(loss1), float(loss4), rtol=1e-5)
    for k in p1:
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(p4[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_multihost_helpers_single_process():
    multihost.initialize()
    info = multihost.host_info()
    assert info["num_processes"] == 1
    assert multihost.is_primary()


def test_train_loop_resume_continues_identically(tmp_path):
    """Kill-and-resume (SURVEY.md §5.3): run 6 steps; separately run 3 steps,
    'crash', resume to 6 — final checkpoints must match bit-for-bit."""
    from vitrs_tpu.train.loop import TrainConfig, train
    common = dict(preset="vit-tiny-4-cifar10", dataset="cifar10",
                  steps=6, batch_size=16, lr=1e-3, warmup=2, dtype="float32",
                  log_every=3, eval_every=0, seed=1,
                  model_overrides=dict(num_layers=2, channels=32, num_heads=2,
                                       use_flash=False))
    w1 = str(tmp_path / "run_straight")
    train(TrainConfig(workdir=w1, ckpt_every=6, **common))
    w2 = str(tmp_path / "run_resumed")
    train(TrainConfig(workdir=w2, ckpt_every=3, run_steps=3,
                      **common))                         # "crash" after 3
    train(TrainConfig(workdir=w2, ckpt_every=3, **common))  # resume to 6
    from vitrs_tpu import checkpoint as C
    p1, _, e1 = C.load_checkpoint(os.path.join(w1, "ckpt_00000006.bin"))
    p2, _, e2 = C.load_checkpoint(os.path.join(w2, "ckpt_00000006.bin"))
    assert e1["cursor"] == e2["cursor"]
    for k in p1:
        np.testing.assert_allclose(p1[k], p2[k], rtol=2e-6, atol=1e-7,
                                   err_msg=k)
