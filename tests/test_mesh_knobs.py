"""Production-training knobs on the mesh-plan families (round-4 verdict #2):
global grad-norm clipping + micro-batch accumulation, with the native DP
path's semantics (parallel/gradops.py), through TP / PP / 3-D / EP.

Strategy: the per-family GRADIENTS are already pinned against the
single-device gradient by each family's own suite, so these tests pin the
two new grad-level transforms — the reported global grad norm equals the
single-device ``sqrt(sum(g²))`` on the same params/batch, and accumulation
over micro-batches reproduces the single-pass loss/norm — plus end-to-end
runs through the production trainer with clip+accum+grad_norm logging.
(Post-AdamW param compares are avoided for the usual reason: at step 1 the
update is ~lr·sign(g), unstable on near-zero grads.)
"""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.models import model as M
from vitrs_tpu.train.loop import TrainConfig, train

GPT_CFG = get_config("gpt-nano", use_flash=False).replace(
    num_layers=4, channels=32, num_heads=2, max_seq_len=8)
MOE_CFG = GPT_CFG.replace(num_experts=4, moe_top_k=2)


def _gpt_data(B=8, seed=0, cfg=GPT_CFG):
    rng = np.random.default_rng(seed)
    toks = rng.integers(0, cfg.vocab_size, (B, cfg.max_seq_len + 1))
    return (jnp.asarray(toks[:, :-1], jnp.int32),
            jnp.asarray(toks[:, 1:], jnp.int32))


def _ref_gnorm(cfg, params, x, y):
    _, grads = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)
    return float(jnp.sqrt(sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)))
        for g in grads.values())))


def _scalars(step_outs):
    *_, loss, gnorm = step_outs
    return float(loss), float(gnorm)


def test_gradops_clip_formula_single_device():
    """clip_by_global_norm == g * min(1, c/(norm+1e-6)) exactly, replicated
    specs counted once."""
    from vitrs_tpu.parallel import gradops
    rng = np.random.default_rng(0)
    g = {"a": jnp.asarray(rng.standard_normal((4, 8), dtype=np.float32)),
         "b": jnp.asarray(rng.standard_normal((16,), dtype=np.float32))}
    specs = {"a": P(), "b": P()}
    want = np.sqrt(sum(float(np.sum(np.square(v))) for v in g.values()))
    clipped, gnorm = gradops.clip_by_global_norm(g, specs, 0.25)
    np.testing.assert_allclose(float(gnorm), want, rtol=1e-6)
    s = min(1.0, 0.25 / (want + 1e-6))
    for k in g:
        np.testing.assert_allclose(np.asarray(clipped[k]),
                                   np.asarray(g[k]) * s, rtol=1e-6)


def _tp_step_outs(accum, clip, seed=3):
    from vitrs_tpu.parallel import tensor_parallel as tp
    mesh = tp.make_mesh_2d(dp=4, tp=2)
    params = PRM.init_params(GPT_CFG, jax.random.PRNGKey(0))
    x, y = _gpt_data(seed=seed)
    # the step donates its inputs, and place can alias replicated leaves —
    # compute the single-device reference BEFORE stepping
    ref = _ref_gnorm(GPT_CFG, params, x, y)
    tpp = tp.place_tp_params(params, GPT_CFG, mesh)
    m, v = tp.init_tp_opt_state(tpp, mesh, GPT_CFG)
    step = tp.make_tp_train_step(GPT_CFG, mesh, accum_steps=accum,
                                 clip_norm=clip, return_grad_norm=True)
    sh = NamedSharding(mesh, P("data"))
    outs = step(tpp, m, v, jax.device_put(x, sh), jax.device_put(y, sh),
                jnp.asarray(1, jnp.int32), jnp.asarray(1e-3, jnp.float32),
                jnp.asarray(0.0, jnp.float32))
    return _scalars(outs), ref


def test_tp_grad_norm_matches_single_device():
    (loss, gnorm), ref = _tp_step_outs(accum=1, clip=0.5)
    np.testing.assert_allclose(gnorm, ref, rtol=2e-4)


def test_tp_accum_matches_single_pass():
    (l1, g1), _ = _tp_step_outs(accum=1, clip=0.0)
    (l2, g2), _ = _tp_step_outs(accum=2, clip=0.0)
    np.testing.assert_allclose(l2, l1, rtol=2e-5)
    np.testing.assert_allclose(g2, g1, rtol=2e-4)


def test_pp_grad_norm_and_accum():
    from vitrs_tpu.parallel import pipeline as pp
    mesh = pp.make_mesh_dp_pp(dp=2, pp=4)
    params = PRM.init_params(GPT_CFG, jax.random.PRNGKey(0))
    x, y = _gpt_data(seed=5)
    sh = NamedSharding(mesh, P("data"))
    ref = _ref_gnorm(GPT_CFG, params, x, y)
    got = {}
    for accum in (1, 2):
        fresh = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
        ppp = pp.place_pp_params(fresh, GPT_CFG, mesh)
        m, v = pp.init_pp_opt_state(ppp, mesh, GPT_CFG)
        step = pp.make_pp_train_step(GPT_CFG, mesh, microbatches=2,
                                     accum_steps=accum, clip_norm=1.0,
                                     return_grad_norm=True)
        got[accum] = _scalars(step(
            ppp, m, v, jax.device_put(x, sh), jax.device_put(y, sh),
            jnp.asarray(1, jnp.int32), jnp.asarray(1e-3, jnp.float32),
            jnp.asarray(0.0, jnp.float32)))
    np.testing.assert_allclose(got[1][1], ref, rtol=2e-4)
    np.testing.assert_allclose(got[2][0], got[1][0], rtol=2e-5)
    np.testing.assert_allclose(got[2][1], got[1][1], rtol=2e-4)


def test_3d_grad_norm_matches_single_device():
    from vitrs_tpu.parallel import threed as td
    mesh = td.make_mesh_3d(dp=2, tp=2, pp=2)
    params = PRM.init_params(GPT_CFG, jax.random.PRNGKey(0))
    x, y = _gpt_data(seed=7)
    sh = NamedSharding(mesh, P("data"))
    ref = _ref_gnorm(GPT_CFG, params, x, y)
    p3 = td.place_params_3d(params, GPT_CFG, mesh)
    m, v = td.init_opt_state_3d(p3, mesh, GPT_CFG)
    step = td.make_3d_train_step(GPT_CFG, mesh, microbatches=2,
                                 clip_norm=0.5, return_grad_norm=True)
    loss, gnorm = _scalars(step(
        p3, m, v, jax.device_put(x, sh), jax.device_put(y, sh),
        jnp.asarray(1, jnp.int32), jnp.asarray(1e-3, jnp.float32),
        jnp.asarray(0.0, jnp.float32)))
    np.testing.assert_allclose(gnorm, ref, rtol=2e-4)


def test_ep_grad_norm_and_accum():
    from vitrs_tpu.parallel import expert_parallel as ep
    mesh = ep.make_mesh_dp_ep(dp=2, ep=4)
    params = PRM.init_params(MOE_CFG, jax.random.PRNGKey(0))
    x, y = _gpt_data(B=16, seed=9, cfg=MOE_CFG)  # 8 (data,expert) shards × 2
    sh = NamedSharding(mesh, P(("data", "expert")))
    ref = _ref_gnorm(MOE_CFG, params, x, y)
    got = {}
    for accum in (1, 2):
        fresh = jax.tree.map(lambda a: jnp.array(a, copy=True), params)
        epp = ep.place_ep_params(fresh, MOE_CFG, mesh)
        m, v = ep.init_ep_opt_state(epp, MOE_CFG, mesh)
        step = ep.make_ep_train_step(MOE_CFG, mesh, accum_steps=accum,
                                     clip_norm=1.0, return_grad_norm=True)
        got[accum] = _scalars(step(
            epp, m, v, jax.device_put(x, sh), jax.device_put(y, sh),
            jnp.asarray(1, jnp.int32), jnp.asarray(1e-3, jnp.float32),
            jnp.asarray(0.0, jnp.float32)))
    # the load-balance aux is per-device-local under EP/DP (quadratic in
    # the token set; documented in ops/moe.py) so the EP gradient differs
    # from single-device through the aux term — close, not exact
    np.testing.assert_allclose(got[1][1], ref, rtol=2e-3)
    # accum on MoE routes each micro-batch at its own capacity (standard
    # accumulation semantics) — at this tiny geometry capacity doesn't bind,
    # but the aux term makes the match merely close, not exact
    np.testing.assert_allclose(got[2][0], got[1][0], rtol=1e-3)
    np.testing.assert_allclose(got[2][1], got[1][1], rtol=1e-2)


@pytest.mark.parametrize("mesh", ["dp=4,tp=2", "dp=2,pp=2", "dp=2,ep=4"])
def test_mesh_cli_clip_accum_end_to_end(mesh, tmp_path):
    """train() --mesh with accum_steps=2, clip_norm=0.5, log_grad_norm:
    loss decreases and the pre-clip grad_norm is in the metrics."""
    overrides = ({"num_experts": 4, "moe_top_k": 2} if "ep" in mesh else None)
    batch = 16 if "ep" in mesh else 8   # ep shards the batch 8 ways
    tc = TrainConfig(preset="gpt-nano", dataset="synthetic", steps=8,
                     batch_size=batch, lr=1e-2, warmup=2, weight_decay=0.0,
                     dtype="float32", workdir=str(tmp_path), log_every=4,
                     ckpt_every=0, resume=True, mesh=mesh,
                     accum_steps=2, clip_norm=0.5, log_grad_norm=True,
                     model_overrides=overrides)
    summary = train(tc)
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert recs[-1]["loss"] < recs[0]["loss"], recs
    assert all("grad_norm" in r and np.isfinite(r["grad_norm"])
               for r in recs), recs
    assert np.isfinite(summary["final_loss"])


def test_mesh_ema_rides_families(tmp_path):
    """EMA (Polyak) on the mesh path (verdict #2 'EMA for vit mode next'):
    the elementwise update rides the family layout; side tree saves
    canonically and resumes; final eval uses the EMA weights."""
    from vitrs_tpu import checkpoint_tree as CT
    w = str(tmp_path)
    tc = TrainConfig(preset="vit-tiny-4-cifar10", dataset="synthetic-shapes",
                     steps=8, batch_size=8, lr=3e-3, warmup=2,
                     weight_decay=0.0, dtype="float32", workdir=w,
                     log_every=4, ckpt_every=4, resume=True,
                     mesh="dp=4,tp=2", ema_decay=0.9,
                     model_overrides={"num_layers": 2, "channels": 32,
                                      "num_heads": 2})
    train(tc)
    trees = sorted(glob.glob(w + "/ema_*.tree"))
    assert trees, "EMA side trees written"
    host_ema, meta = CT.load_tree(trees[-1])
    assert meta["decay"] == 0.9 and "qkvw" in host_ema   # canonical keys
    # resume continues with the saved EMA (no crash, loss finite)
    tc2 = TrainConfig(preset="vit-tiny-4-cifar10", dataset="synthetic-shapes",
                      steps=12, batch_size=8, lr=3e-3, warmup=2,
                      weight_decay=0.0, dtype="float32", workdir=w,
                      log_every=4, ckpt_every=4, resume=True,
                      mesh="dp=4,tp=2", ema_decay=0.9,
                      model_overrides={"num_layers": 2, "channels": 32,
                                       "num_heads": 2})
    summary = train(tc2)
    assert np.isfinite(summary["final_loss"])
    recs = [json.loads(l) for l in open(os.path.join(w, "metrics.jsonl"))]
    assert recs[-1]["step"] == 12
