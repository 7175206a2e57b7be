"""FSDP (ZeRO-3, parallel/fsdp.py): params + optimizer state sharded at
rest, math identical to single-device training."""

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu import params as P_
from vitrs_tpu.config import ViTConfig
from vitrs_tpu.models import model as M
from vitrs_tpu.ops import optimizer as opt
from vitrs_tpu.parallel import fsdp
from jax.sharding import PartitionSpec as P

# dims divisible by the 8-device mesh so every big tensor actually shards
CFG = ViTConfig(mode="gpt", max_seq_len=16, vocab_size=104, num_heads=2,
                channels=16, num_layers=2, use_flash=False,
                dtype="float32").validate()


def _data(B=16):
    rng = np.random.default_rng(0)
    tok = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, 16)))
    tgt = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, 16)))
    return tok, tgt


def test_spec_rule():
    assert fsdp.spec_for((104, 16), 8) == P("fsdp", None)   # largest axis
    assert fsdp.spec_for((2, 48, 16), 8) == P(None, "fsdp", None)
    assert fsdp.spec_for((7, 9), 8) == P()                  # nothing divides
    assert fsdp.spec_for((16,), 8) == P("fsdp")
    # tie (both divisible, equal size) -> later axis
    assert fsdp.spec_for((16, 16), 8) == P(None, "fsdp")


def test_params_and_state_are_sharded_at_rest():
    mesh = fsdp.make_mesh(8)
    params = fsdp.place_params(P_.init_params(CFG, jax.random.PRNGKey(0)),
                               mesh)
    m, v = fsdp.init_opt_state(params, mesh)
    n_shardable = 0
    for k, p in params.items():
        spec = fsdp.spec_for(p.shape, mesh.size)
        if spec != P():
            n_shardable += 1
            for t in (p, m[k], v[k]):
                shard = t.addressable_shards[0].data
                assert shard.size == t.size // mesh.size, k
    assert n_shardable >= 14   # every big tensor shards at this geometry


def test_fsdp_step_matches_single_device():
    mesh = fsdp.make_mesh(8)
    params0 = P_.init_params(CFG, jax.random.PRNGKey(0))
    zeros = lambda: jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params0)
    tok, tgt = _data()
    s = (jnp.asarray(1, jnp.int32), jnp.asarray(1e-3, jnp.float32))

    # single device
    def ref_step(p, m, v, step_i):
        loss, g = jax.value_and_grad(M.loss_fn)(p, tok, tgt, CFG)
        p, m, v = opt.adamw_tree(p, g, m, v, step_i, s[1], weight_decay=0.1)
        return p, m, v, loss

    p1, m1, v1, loss1 = jax.jit(ref_step)(params0, zeros(), zeros(), s[0])

    # fsdp mesh
    step = fsdp.make_fsdp_train_step(CFG, mesh, params0, weight_decay=0.1)
    pf = fsdp.place_params(params0, mesh)
    mf, vf = fsdp.init_opt_state(pf, mesh)
    pf, mf, vf, lossf = step(pf, mf, vf, tok, tgt, *s)

    np.testing.assert_allclose(float(lossf), float(loss1), rtol=1e-6)
    for k in p1:
        np.testing.assert_allclose(np.asarray(pf[k]), np.asarray(p1[k]),
                                   rtol=2e-6, atol=1e-7, err_msg=k)
        np.testing.assert_allclose(np.asarray(mf[k]), np.asarray(m1[k]),
                                   rtol=2e-6, atol=1e-7, err_msg=k)

    # second step keeps the sharded layout (donation round-trips)
    pf2, mf2, vf2, loss2 = step(pf, mf, vf, tok, tgt,
                                jnp.asarray(2, jnp.int32), s[1])
    p2, _, _, loss2_ref = jax.jit(ref_step)(p1, m1, v1,
                                            jnp.asarray(2, jnp.int32))
    np.testing.assert_allclose(float(loss2), float(loss2_ref), rtol=1e-6)
    for k in p2:
        np.testing.assert_allclose(np.asarray(pf2[k]), np.asarray(p2[k]),
                                   rtol=5e-6, atol=1e-7, err_msg=k)


def test_fsdp_vit_mode_runs():
    cfg = ViTConfig(mode="vit", img_size=16, patch_size=4, channels=16,
                    num_heads=2, num_layers=2, num_classes=8,
                    max_seq_len=17, vocab_size=8, pool="cls",
                    use_flash=False, dtype="float32").validate()
    mesh = fsdp.make_mesh(8)
    params = P_.init_params(cfg, jax.random.PRNGKey(1))
    step = fsdp.make_fsdp_train_step(cfg, mesh, params)
    pf = fsdp.place_params(params, mesh)
    mf, vf = fsdp.init_opt_state(pf, mesh)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((16, 16, 16, 3), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 8, (16,)))
    losses = []
    for i in range(1, 4):
        pf, mf, vf, loss = step(pf, mf, vf, x, y,
                                jnp.asarray(i, jnp.int32),
                                jnp.asarray(3e-3, jnp.float32))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_hybrid_fsdp_matches_single_device_and_pure_fsdp():
    """dp=2,fsdp=4 (the hybrid pod deployment, round-4 verdict #6): params
    shard over "fsdp" only (1/4 shards, replicated over "replica"), the
    batch shards 8 ways, and one step matches both the single-device
    reference and the pure fsdp=8 step on the same global batch."""
    mesh_h = fsdp.make_hybrid_mesh(replica=2, shard=4)
    assert mesh_h.axis_names == ("replica", "fsdp") and mesh_h.size == 8
    params0 = P_.init_params(CFG, jax.random.PRNGKey(0))
    tok, tgt = _data()
    s = (jnp.asarray(1, jnp.int32), jnp.asarray(1e-3, jnp.float32))

    def ref_step(p, m, v, step_i):
        loss, g = jax.value_and_grad(M.loss_fn)(p, tok, tgt, CFG)
        p, m, v = opt.adamw_tree(p, g, m, v, step_i, s[1], weight_decay=0.1)
        return p, m, v, loss

    zeros = lambda: jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params0)
    p1, m1, v1, loss1 = jax.jit(ref_step)(params0, zeros(), zeros(), s[0])

    step = fsdp.make_fsdp_train_step(CFG, mesh_h, params0, weight_decay=0.1)
    ph = fsdp.place_params(params0, mesh_h)
    # params shard 4-ways (the fsdp axis), NOT 8-ways
    for k, p in ph.items():
        if fsdp.spec_for(p.shape, 4) != P():
            assert p.addressable_shards[0].data.size == p.size // 4, k
    mh, vh = fsdp.init_opt_state(ph, mesh_h)
    ph, mh, vh, lossh = step(ph, mh, vh, tok, tgt, *s)
    np.testing.assert_allclose(float(lossh), float(loss1), rtol=1e-6)
    for k in p1:
        np.testing.assert_allclose(np.asarray(ph[k]), np.asarray(p1[k]),
                                   rtol=2e-6, atol=1e-7, err_msg=k)


def test_hybrid_fsdp_mesh_cli(tmp_path):
    """--mesh dp=2,fsdp=4 through the production trainer: loss decreases,
    checkpoint resumes."""
    import glob
    import json
    import os
    from vitrs_tpu.train.loop import TrainConfig, train
    tc = TrainConfig(preset="gpt-nano", dataset="synthetic", steps=10,
                     batch_size=8, lr=1e-2, warmup=2, weight_decay=0.0,
                     dtype="float32", workdir=str(tmp_path), log_every=5,
                     ckpt_every=5, resume=True, mesh="dp=2,fsdp=4")
    train(tc)
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert recs[-1]["loss"] < recs[0]["loss"], recs
    assert recs[-1]["mesh"] == "dp=2,fsdp=4"
    assert glob.glob(str(tmp_path) + "/ckpt_*.bin")
    # resume continues from step 10
    train(TrainConfig(preset="gpt-nano", dataset="synthetic", steps=14,
                      batch_size=8, lr=1e-2, warmup=2, weight_decay=0.0,
                      dtype="float32", workdir=str(tmp_path), log_every=7,
                      ckpt_every=7, resume=True, mesh="dp=2,fsdp=4"))
    recs = [json.loads(l) for l in
            open(os.path.join(str(tmp_path), "metrics.jsonl"))]
    assert recs[-1]["step"] == 14 and np.isfinite(recs[-1]["loss"])
