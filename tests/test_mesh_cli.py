"""Mesh-spec trainer: the `vitrs-train --mesh ...` path (train/mesh.py).

Round-3 verdict item: every parallel family existed but none was launchable
from the shipped entry point.  These tests drive the FULL production train()
loop (data loader, schedule, checkpoint/resume, metrics) through the mesh
plans on the 8-virtual-device CPU mesh — loss decreasing end to end, resume
deterministic, and checkpoints portable ACROSS mesh specs (the canonical-
layout contract).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu.train.loop import TrainConfig, train
from vitrs_tpu.train.mesh import MeshSpec, make_plan, parse_mesh


def test_parse_mesh_specs():
    s = parse_mesh("dp=2,tp=2,pp=2")
    assert (s.dp, s.tp, s.pp) == (2, 2, 2) and s.n_devices == 8
    s = parse_mesh("dp=2,tp=2,sp")
    assert s.sp and not s.vp
    s = parse_mesh("tp=4,vp")
    assert s.vp and s.tp == 4
    s = parse_mesh("pp=2,schedule=1f1b-interleaved,v=2,mb=8")
    assert s.schedule == "1f1b-interleaved" and s.virtual == 2 \
        and s.microbatches == 8
    s = parse_mesh("fsdp=8")
    assert s.fsdp == 8 and s.n_devices == 8
    s = parse_mesh("ep=2,tp=2")
    assert s.ep == 2 and s.tp == 2
    with pytest.raises(ValueError):
        parse_mesh("zz=3")


def test_pure_dp_spec_returns_none():
    from vitrs_tpu.config import get_config
    cfg = get_config("gpt-nano", use_flash=False)
    assert make_plan(cfg, parse_mesh("dp=4")) is None


def _gpt_tc(workdir, mesh, **kw):
    base = dict(preset="gpt-nano", dataset="synthetic", steps=8,
                batch_size=8, lr=1e-2, warmup=2, weight_decay=0.0,
                dtype="float32", workdir=workdir, log_every=4,
                ckpt_every=0, resume=True, mesh=mesh)
    base.update(kw)
    return TrainConfig(**base)


MESHES = ["dp=2,tp=2,pp=2", "dp=4,tp=2", "dp=2,tp=2,sp", "tp=2,vp",
          "dp=2,pp=2,schedule=1f1b", "cp=2", "fsdp=8",
          "pp=2,schedule=1f1b-interleaved,v=1,mb=4"]


@pytest.mark.parametrize("mesh", MESHES)
def test_mesh_cli_end_to_end_loss_decreases(mesh, tmp_path):
    summary = train(_gpt_tc(str(tmp_path), mesh, steps=10))
    import json
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert recs[-1]["loss"] < recs[0]["loss"], recs
    assert np.isfinite(summary["final_loss"])
    # a canonical checkpoint + meshopt tree were written
    assert glob.glob(str(tmp_path) + "/ckpt_*.bin")
    assert glob.glob(str(tmp_path) + "/meshopt_*.tree")


def test_mesh_cli_moe_ep_end_to_end(tmp_path):
    tc = _gpt_tc(str(tmp_path), "dp=2,ep=4", steps=10,
                 model_overrides={"num_experts": 4, "moe_top_k": 2})
    summary = train(tc)
    import json
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert recs[-1]["loss"] < recs[0]["loss"], recs
    assert np.isfinite(summary["final_loss"])


def test_mesh_cli_moe_ep_tp_adafactor(tmp_path):
    tc = _gpt_tc(str(tmp_path), "dp=2,ep=2,tp=2", steps=10,
                 model_overrides={"num_experts": 4, "moe_top_k": 2})
    train(tc)
    tc2 = _gpt_tc(str(tmp_path) + "_af", "dp=2,ep=4", steps=12, lr=0.05,
                  optimizer="adafactor",
                  model_overrides={"num_experts": 4, "moe_top_k": 2})
    train(tc2)
    import json
    for wd in (str(tmp_path), str(tmp_path) + "_af"):
        recs = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
        assert recs[-1]["loss"] < recs[0]["loss"], (wd, recs)


def test_mesh_resume_is_deterministic(tmp_path):
    """3+3 steps with a checkpoint in between == 6 straight steps, same
    mesh (bit-exact contract of the canonical checkpoint round-trip)."""
    mesh = "dp=2,tp=2"
    w1, w2 = str(tmp_path / "a"), str(tmp_path / "b")
    train(_gpt_tc(w1, mesh, steps=6, ckpt_every=6))
    train(_gpt_tc(w2, mesh, steps=6, ckpt_every=3, run_steps=3))
    train(_gpt_tc(w2, mesh, steps=6, ckpt_every=3))
    from vitrs_tpu import checkpoint as C
    p1, _, e1 = C.load_checkpoint(sorted(glob.glob(w1 + "/ckpt_*.bin"))[-1])
    p2, _, e2 = C.load_checkpoint(sorted(glob.glob(w2 + "/ckpt_*.bin"))[-1])
    assert e1["step"] == e2["step"] == 6
    for k in p1:
        np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p2[k]),
                                      err_msg=k)


def test_mesh_resume_across_mesh_change(tmp_path):
    """A checkpoint written under dp=2,tp=2,pp=2 resumes under dp=4,tp=2
    (and the optimizer state survives the re-layout) — the canonical-
    checkpoint portability contract.  Parity with an uninterrupted run is
    numeric (reduction orders differ across meshes), so assert close."""
    w1, w2 = str(tmp_path / "a"), str(tmp_path / "b")
    train(_gpt_tc(w1, "dp=2,tp=2,pp=2", steps=6, ckpt_every=6))
    train(_gpt_tc(w2, "dp=2,tp=2,pp=2", steps=6, ckpt_every=3, run_steps=3))
    train(_gpt_tc(w2, "dp=4,tp=2", steps=6, ckpt_every=3))   # mesh change!
    from vitrs_tpu import checkpoint as C
    p1, _, _ = C.load_checkpoint(sorted(glob.glob(w1 + "/ckpt_*.bin"))[-1])
    p2, _, e2 = C.load_checkpoint(sorted(glob.glob(w2 + "/ckpt_*.bin"))[-1])
    assert e2["step"] == 6
    for k in p1:
        a, b = np.asarray(p1[k], np.float64), np.asarray(p2[k], np.float64)
        np.testing.assert_allclose(b, a, rtol=2e-3,
                                   atol=1e-4 * max(1.0, np.abs(a).max()),
                                   err_msg=k)


@pytest.mark.parametrize("mesh", ["dp=4,tp=2", "dp=2,pp=2",
                                  "dp=2,tp=2,pp=2"])
def test_mesh_cli_adafactor_families(mesh, tmp_path):
    """--optimizer adafactor under the TP / PP / 3-D mesh plans: loss
    decreases end-to-end through the production loop and the state side
    tree round-trips a resume."""
    import json
    tc = _gpt_tc(str(tmp_path), mesh, steps=12, lr=0.05,
                 optimizer="adafactor", ckpt_every=6)
    train(tc)
    train(tc)       # resume from step 12 checkpoint is a no-op run
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert recs[-1]["loss"] < recs[0]["loss"], recs
    assert glob.glob(str(tmp_path) + "/meshopt_*.tree")


def test_mesh_cli_moe_pp_end_to_end(tmp_path):
    """MoE through the GPipe pipeline from the production trainer
    (--mesh dp=2,pp=2 on a MoE config)."""
    import json
    tc = _gpt_tc(str(tmp_path), "dp=2,pp=2", steps=10,
                 model_overrides={"num_experts": 4, "moe_top_k": 2})
    train(tc)
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert recs[-1]["loss"] < recs[0]["loss"], recs


def test_mesh_resume_cross_family_adafactor_reinits(tmp_path, capsys):
    """Advisor (round 4, medium): an Adafactor meshopt tree is keyed by the
    WRITING family's pytree names; resuming the same workdir under another
    family must warn + re-init the optimizer state (documented behavior),
    not crash with KeyError('qkv3b')."""
    import json
    w = str(tmp_path)
    train(_gpt_tc(w, "dp=4,tp=2", steps=8, lr=0.05, run_steps=4,
                  optimizer="adafactor", ckpt_every=4))
    train(_gpt_tc(w, "dp=2,pp=2", steps=8, lr=0.05,
                  optimizer="adafactor", ckpt_every=4))  # family change!
    out = capsys.readouterr().out
    assert "re-initializing" in out
    recs = [json.loads(l) for l in open(os.path.join(w, "metrics.jsonl"))]
    assert recs[-1]["step"] == 8 and np.isfinite(recs[-1]["loss"])


def test_mesh_resume_optimizer_mismatch_reinits(tmp_path, capsys):
    """Advisor (round 4, low): resuming an Adafactor-written tree with
    --optimizer adamw re-inits with a clear notice instead of KeyError."""
    import json
    w = str(tmp_path)
    train(_gpt_tc(w, "dp=4,tp=2", steps=8, lr=0.05, run_steps=4,
                  optimizer="adafactor", ckpt_every=4))
    train(_gpt_tc(w, "dp=4,tp=2", steps=8, ckpt_every=4))  # adamw now
    out = capsys.readouterr().out
    assert "re-initializing optimizer state" in out
    recs = [json.loads(l) for l in open(os.path.join(w, "metrics.jsonl"))]
    assert recs[-1]["step"] == 8 and np.isfinite(recs[-1]["loss"])


def test_mesh_cp_opt_state_is_canonical_and_portable(tmp_path):
    """Advisor (round 4, low): cp's AdamW m/v are saved as canonical
    name-keyed dicts, so a cp-written meshopt tree LOADS under tp (and a
    tp-written one under cp) — full AdamW cross-family state portability."""
    from vitrs_tpu import checkpoint_tree as CT
    from vitrs_tpu.config import get_config
    w = str(tmp_path)
    train(_gpt_tc(w, "cp=2", steps=4, ckpt_every=4))
    tree, meta = CT.load_tree(sorted(glob.glob(w + "/meshopt_*.tree"))[-1])
    assert isinstance(tree["m"], dict) and "qkvw" in tree["m"]
    # the cp-written state round-trips through the TP family's opt_load
    cfg = get_config("gpt-nano", use_flash=False)
    plan_tp = make_plan(cfg, parse_mesh("dp=4,tp=2"))
    m, v = plan_tp.opt_load(tree)
    assert set(m) == set(plan_tp.place(
        {k: np.zeros(s, np.float32) for k, s in
         __import__("vitrs_tpu.params", fromlist=["param_shapes"]
                    ).param_shapes(cfg).items()}))
    # and a tp-written state loads under cp
    train(_gpt_tc(w + "_tp", "dp=4,tp=2", steps=4, ckpt_every=4))
    tree2, _ = CT.load_tree(
        sorted(glob.glob(w + "_tp/meshopt_*.tree"))[-1])
    plan_cp = make_plan(cfg, parse_mesh("cp=2"))
    m2, v2 = plan_cp.opt_load(tree2)
    assert m2.shape[0] >= sum(
        int(np.prod(s)) for s in __import__(
            "vitrs_tpu.params", fromlist=["param_shapes"]
        ).param_shapes(cfg).values())
