"""Async + multi-host range-sharded checkpointing (VERDICT r1 next #8)."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu import checkpoint as C
from vitrs_tpu import params as PRM
from vitrs_tpu.checkpoint_async import AsyncCheckpointer, save_checkpoint_sharded
from vitrs_tpu.config import get_config


def _cfg():
    return get_config("vit-tiny-4-cifar10", use_flash=False).replace(
        num_layers=2, channels=32, num_heads=2)


def test_async_save_bitwise_matches_sync(tmp_path):
    cfg = _cfg()
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))
    n = PRM.num_parameters(cfg)
    rng = np.random.default_rng(0)
    m = jnp.asarray(rng.standard_normal(n, np.float32))
    v = jnp.asarray(np.abs(rng.standard_normal(n)).astype(np.float32))
    sync_path = str(tmp_path / "sync.bin")
    C.save_checkpoint(sync_path, jax.device_get(params), cfg,
                      m=np.asarray(m), v=np.asarray(v), step=7, seed=3,
                      cursor=99)
    ck = AsyncCheckpointer()
    async_path = str(tmp_path / "async.bin")
    ck.save(async_path, params, cfg, m=m, v=v, step=7, seed=3, cursor=99)
    ck.close()
    with open(sync_path, "rb") as f1, open(async_path, "rb") as f2:
        assert f1.read() == f2.read()          # byte-identical files


def test_async_save_is_a_snapshot(tmp_path):
    """Values written are those at save() time even if the caller mutates /
    deletes its arrays afterwards (donation-safety semantics)."""
    cfg = _cfg()
    params = {k: jnp.asarray(v) for k, v in
              jax.device_get(PRM.init_params(cfg, jax.random.PRNGKey(1))).items()}
    want = {k: np.asarray(v).copy() for k, v in params.items()}
    ck = AsyncCheckpointer()
    path = str(tmp_path / "snap.bin")
    ck.save(path, params, cfg, step=1)
    # simulate donation: delete the caller's buffers immediately
    for k in list(params):
        params[k].delete()
    ck.close()
    got, _, extras = C.load_checkpoint(path)
    assert extras["step"] == 1
    for k in want:
        np.testing.assert_array_equal(got[k], np.asarray(want[k]))


def test_async_overlaps_training_steps(tmp_path):
    """save() returns quickly and training continues while the write drains;
    the checkpoint is consistent with the pre-save params even though many
    more steps ran before wait()."""
    from vitrs_tpu.vit import ViT
    model = ViT.from_config(_cfg())
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32, 32, 3), dtype=np.float32)
    y = rng.integers(0, 10, (16,))
    model.train_step(x, y, lr=1e-3)            # warm compile
    snapshot = jax.device_get(model.params)
    ck = AsyncCheckpointer()
    path = str(tmp_path / "ovl.bin")
    t0 = time.perf_counter()
    ck.save(path, model.params, model.config, step=1)
    t_save = time.perf_counter() - t0
    for _ in range(5):                         # keep training immediately
        model.train_step(x, y, lr=1e-3)
    ck.close()
    got, _, _ = C.load_checkpoint(path)
    for k in snapshot:
        np.testing.assert_array_equal(got[k], np.asarray(snapshot[k]),
                                      err_msg=k)
    # params moved on since the snapshot (fcw is trained in vit mode)
    assert not np.array_equal(np.asarray(model.params["fcw"]),
                              snapshot["fcw"])
    assert t_save < 5.0, t_save


def test_async_checkpointer_surfaces_writer_errors(tmp_path):
    cfg = _cfg()
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))
    ck = AsyncCheckpointer()
    ck.save(str(tmp_path / "no_such_dir" / "x.bin"), params, cfg)
    time.sleep(0.1)
    try:
        import pytest
        with pytest.raises(Exception):
            ck.wait()
    finally:
        pass


def test_sharded_write_equals_single_host_file(tmp_path):
    """N simulated hosts each write their range into one file; the result is
    byte-identical to a plain save_checkpoint and loads bit-exact."""
    cfg = _cfg()
    params = jax.device_get(PRM.init_params(cfg, jax.random.PRNGKey(2)))
    n = PRM.num_parameters(cfg)
    rng = np.random.default_rng(2)
    m = rng.standard_normal(n).astype(np.float32)
    v = np.abs(rng.standard_normal(n)).astype(np.float32)
    ref_path = str(tmp_path / "single.bin")
    C.save_checkpoint(ref_path, params, cfg, m=m, v=v, step=11, seed=5,
                      cursor=1234)
    for num_hosts in (1, 3, 4):
        sh_path = str(tmp_path / f"sharded{num_hosts}.bin")
        for host in range(num_hosts):          # any order works; 0 allocates
            save_checkpoint_sharded(sh_path, cfg, host, num_hosts,
                                    params=params, m=m, v=v, step=11, seed=5,
                                    cursor=1234)
        with open(ref_path, "rb") as f1, open(sh_path, "rb") as f2:
            assert f1.read() == f2.read(), f"num_hosts={num_hosts}"
        p2, _, e2 = C.load_checkpoint(sh_path)
        assert e2["step"] == 11 and e2["cursor"] == 1234
        np.testing.assert_array_equal(e2["m"], m)
        for k in params:
            np.testing.assert_array_equal(p2[k], params[k])


def test_train_loop_async_resume_still_bit_exact(tmp_path):
    """Kill-and-resume with async_ckpt=True matches the uninterrupted run —
    the async snapshot must capture exactly the post-step state."""
    from vitrs_tpu.train.loop import TrainConfig, train
    common = dict(preset="vit-tiny-4-cifar10", dataset="cifar10",
                  steps=4, batch_size=16, lr=1e-3, warmup=2, dtype="float32",
                  log_every=2, eval_every=0, seed=1, async_ckpt=True,
                  model_overrides=dict(num_layers=2, channels=32, num_heads=2,
                                       use_flash=False))
    w1 = str(tmp_path / "straight")
    train(TrainConfig(workdir=w1, ckpt_every=4, **common))
    w2 = str(tmp_path / "resumed")
    train(TrainConfig(workdir=w2, ckpt_every=2, run_steps=2, **common))
    train(TrainConfig(workdir=w2, ckpt_every=2, **common))
    p1, _, e1 = C.load_checkpoint(os.path.join(w1, "ckpt_00000004.bin"))
    p2, _, e2 = C.load_checkpoint(os.path.join(w2, "ckpt_00000004.bin"))
    assert e1["cursor"] == e2["cursor"]
    for k in p1:
        np.testing.assert_allclose(p1[k], p2[k], rtol=2e-6, atol=1e-7,
                                   err_msg=k)
