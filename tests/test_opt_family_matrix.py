"""Round-4 verdict #3 — complete the optimizer × parallel-family matrix:
Muon through --mesh (TP/SP, FSDP), Adafactor for EP×TP / CP /
interleaved-1F1B.  Step-parity tests follow the established patterns
(test_adafactor's TP row, test_moe's EP row), end-to-end rows drive the
production trainer.
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
from vitrs_tpu.ops import adafactor as AF
from vitrs_tpu.ops import optimizer as OPT
from vitrs_tpu.train.loop import TrainConfig, train
from vitrs_tpu.train.mesh import make_plan, parse_mesh


# --- Adafactor: EP x TP ------------------------------------------------------

def test_ep_tp_adafactor_parity_vs_single_device():
    """dp×ep×tp Adafactor == single-device AF.step on the TP-layout pytree:
    expert slabs compose leading-"expert" invariance with "model"
    gathered-stats pmeans (fcw sd=-2, fcprojw/fcb sd=-1).  min_factor=2
    exercises the factored paths at tiny scale; aux_weight=0 + big cap
    removes the (documented) per-device-local aux from the comparison."""
    from vitrs_tpu.parallel import expert_parallel as EP
    cfg = get_config("gpt-nano", use_flash=False).replace(
        num_layers=2, channels=16, num_heads=4, max_seq_len=16,
        num_experts=4, moe_top_k=2, moe_cap_factor=8.0, moe_aux_weight=0.0,
        moe_zloss_weight=0.0)
    MF = 2
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    toks = np.asarray(jax.random.randint(jax.random.PRNGKey(1), (8, 16),
                                         0, cfg.vocab_size))
    tgt = np.asarray(jax.random.randint(jax.random.PRNGKey(2), (8, 16),
                                        0, cfg.vocab_size))

    tpp = EP.to_ep_tp_params(p, cfg)
    st0 = AF.init_state(tpp, min_factor=MF)
    _, g = jax.value_and_grad(
        lambda q: M.gpt_loss(EP.from_ep_tp_params(q, cfg), jnp.asarray(toks),
                             jnp.asarray(tgt), cfg))(tpp)
    p_ref, _ = AF.step(tpp, g, st0, jnp.asarray(1), 0.01, weight_decay=0.1,
                       decay_mask=OPT.decay_mask_2d(tpp), min_factor=MF)
    p_ref = jax.device_get(p_ref)

    mesh = EP.make_mesh_dp_ep_tp(2, 2, 2)
    placed = EP.place_ep_tp_params({k: np.asarray(v) for k, v in p.items()},
                                   cfg, mesh)
    st = EP.init_ep_tp_af_state(placed, cfg, mesh, min_factor=MF)
    step_fn = EP.make_ep_tp_train_step_adafactor(cfg, mesh, min_factor=MF)
    sh = NamedSharding(mesh, P(("data", "expert")))
    p_out, st, loss = step_fn(
        placed, st, jax.device_put(jnp.asarray(toks), sh),
        jax.device_put(jnp.asarray(tgt), sh),
        jnp.asarray(1, jnp.int32), jnp.asarray(0.01, jnp.float32),
        jnp.asarray(0.1, jnp.float32))
    assert np.isfinite(float(loss))
    for k in p_ref:
        a = np.asarray(p_ref[k], np.float64)
        # atol covers the zero-gradient K-bias rows (softmax shift
        # invariance: their fp32 noise differs across programs and
        # u=g·rsqrt(v) amplifies it — the test_adafactor precedent)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(p_out[k])), a, rtol=1e-4,
            atol=3e-4 * max(1.0, np.abs(a).max()), err_msg=k)


# --- Adafactor: CP -----------------------------------------------------------

def test_cp_adafactor_parity_vs_single_device():
    """dp×cp Adafactor == single-device AF.step on the full batch (ring
    grads are exact; state replicated)."""
    from vitrs_tpu.parallel import ring_attention as RA
    cfg = get_config("gpt-nano", use_flash=False).replace(
        num_layers=2, channels=16, num_heads=2, max_seq_len=16)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    toks = np.asarray(jax.random.randint(jax.random.PRNGKey(1), (8, 16),
                                         0, cfg.vocab_size))
    tgt = np.asarray(jax.random.randint(jax.random.PRNGKey(2), (8, 16),
                                        0, cfg.vocab_size))
    _, g = jax.value_and_grad(M.gpt_loss)(p, jnp.asarray(toks),
                                          jnp.asarray(tgt), cfg)
    st0 = AF.init_state(p)
    p_ref, _ = AF.step(p, g, st0, jnp.asarray(1), 0.01, weight_decay=0.1,
                       decay_mask=OPT.decay_mask_2d(p))
    p_ref = jax.device_get(p_ref)

    mesh = RA.make_mesh_dp_cp(2, 2)
    placed = {k: jax.device_put(np.asarray(v), NamedSharding(mesh, P()))
              for k, v in p.items()}
    st = RA.init_cp_af_state(placed, mesh)
    step_fn = RA.make_cp_train_step_adafactor(cfg, mesh)
    sh = NamedSharding(mesh, P("data", "ctx"))
    p_out, st, loss = step_fn(
        placed, st, jax.device_put(jnp.asarray(toks), sh),
        jax.device_put(jnp.asarray(tgt), sh),
        jnp.asarray(1, jnp.int32), jnp.asarray(0.01, jnp.float32),
        jnp.asarray(0.1, jnp.float32))
    assert np.isfinite(float(loss))
    for k in p_ref:
        a = np.asarray(p_ref[k], np.float64)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(p_out[k])), a, rtol=1e-4,
            atol=3e-4 * max(1.0, np.abs(a).max()), err_msg=k)


# --- Adafactor: interleaved state permutation --------------------------------

def test_permute_af_tree_round_trip():
    from vitrs_tpu.parallel import pipeline as PP
    cfg = get_config("gpt-nano", use_flash=False).replace(
        num_layers=8, channels=16, num_heads=2, max_seq_len=8)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    st = AF.init_state(p, min_factor=2)
    rng = np.random.default_rng(0)
    vr = {k: (rng.standard_normal(v.shape).astype(np.float32)
              if np.ndim(v) else np.float32(0)) for k, v in st.vr.items()}
    fwd = PP.permute_af_tree(vr, cfg, 2, 2)
    back = PP.permute_af_tree(fwd, cfg, 2, 2, inverse=True)
    for k in vr:
        np.testing.assert_array_equal(np.asarray(back[k]),
                                      np.asarray(vr[k]), err_msg=k)
    # the permutation matches the param interleave order
    order = PP.interleave_layer_order(cfg.num_layers, 2, 2)
    np.testing.assert_array_equal(np.asarray(fwd["fcw"]),
                                  np.asarray(vr["fcw"])[order])


# --- end-to-end through the production trainer -------------------------------

def _tc(workdir, mesh, **kw):
    base = dict(preset="gpt-nano", dataset="synthetic", steps=10,
                batch_size=8, lr=1e-2, warmup=2, weight_decay=0.0,
                dtype="float32", workdir=workdir, log_every=5,
                ckpt_every=0, resume=True, mesh=mesh)
    base.update(kw)
    return TrainConfig(**base)


NEW_AF_MESHES = ["cp=2", "dp=2,ep=2,tp=2",
                 "pp=2,schedule=1f1b-interleaved,v=2,mb=4"]


@pytest.mark.parametrize("mesh", NEW_AF_MESHES)
def test_mesh_cli_adafactor_new_families(mesh, tmp_path):
    overrides = ({"num_experts": 4, "moe_top_k": 2} if "ep" in mesh
                 else {"num_layers": 4} if "v=2" in mesh  # 2 stages × V=2
                 else None)
    batch = 16 if "ep" in mesh else 8
    tc = _tc(str(tmp_path), mesh, steps=12, lr=0.05, batch_size=batch,
             optimizer="adafactor", ckpt_every=6,
             model_overrides=overrides)
    train(tc)
    train(tc)       # resume from the step-12 checkpoint is a no-op run
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert recs[-1]["loss"] < recs[0]["loss"], recs
    assert glob.glob(str(tmp_path) + "/meshopt_*.tree")


MUON_MESHES = ["dp=4,tp=2", "dp=2,tp=2,sp", "fsdp=8"]


@pytest.mark.parametrize("mesh", MUON_MESHES)
def test_mesh_cli_muon_families(mesh, tmp_path):
    tc = _tc(str(tmp_path), mesh, steps=10, lr=0.02,
             optimizer="muon", muon_adamw_lr=6e-3, ckpt_every=5)
    train(tc)
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert recs[-1]["loss"] < recs[0]["loss"], recs
    # resume: the muon meshopt tree round-trips
    train(_tc(str(tmp_path), mesh, steps=14, lr=0.02,
              optimizer="muon", muon_adamw_lr=6e-3, ckpt_every=7))
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert recs[-1]["step"] == 14 and np.isfinite(recs[-1]["loss"])


def test_muon_state_portable_tp_to_fsdp():
    """The muon meshopt trees are canonical (momentum/m/v keyed by
    canonical names), so a TP-written state loads under FSDP and back."""
    cfg = get_config("gpt-nano", use_flash=False)
    plan_tp = make_plan(cfg, parse_mesh("dp=4,tp=2"), optimizer="muon")
    plan_fs = make_plan(cfg, parse_mesh("fsdp=8"), optimizer="muon")
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    host = {k: np.asarray(v) for k, v in p.items()}
    o_tp = plan_tp.init_opt(plan_tp.place(host))
    tree = plan_tp.opt_save(o_tp)
    assert "qkvw" in tree["momentum"]          # canonical keys
    st_fs = plan_fs.opt_load(tree)             # loads under FSDP
    o_fs = plan_fs.init_opt(plan_fs.place(host))
    assert set(st_fs.momentum) == set(o_fs.momentum)
    back = plan_fs.opt_save(st_fs)
    st_tp2 = plan_tp.opt_load(back)            # and back under TP
    mom, m, v = st_tp2
    assert set(mom) == set(o_tp[0])
