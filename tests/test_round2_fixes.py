"""Round-2 hygiene fixes pinned by tests (VERDICT r1 'weak' items + ADVICE):
checkpoint version validation, config-mismatch raising, held-out GPT val
split, EMA persist/resume, MAE decoder geometry threading, single-program
forward()."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu import checkpoint as C
from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.data import tokens as TOK


def _tiny_cfg(**kw):
    return get_config("vit-tiny-4-cifar10", use_flash=False, **kw).replace(
        num_layers=2, channels=32, num_heads=2)


# ---------------------------------------------------------------------------
# checkpoint loader validation (ADVICE low #1 + VERDICT weak #8)
# ---------------------------------------------------------------------------

def test_load_rejects_unknown_version(tmp_path):
    """An llm.c bf16 export (version 3, same magic) must fail loudly, not be
    reinterpreted as f32 garbage."""
    cfg = _tiny_cfg()
    params = jax.device_get(PRM.init_params(cfg, jax.random.PRNGKey(0)))
    path = str(tmp_path / "v3.bin")
    C.save_checkpoint(path, params, cfg)
    with open(path, "r+b") as f:
        h = np.frombuffer(f.read(C.HEADER_BYTES), np.int32).copy()
        h[1] = 3
        f.seek(0)
        f.write(h.tobytes())
    with pytest.raises(ValueError, match="version 3"):
        C.load_checkpoint(path)


def test_load_config_mismatch_raises_valueerror(tmp_path):
    """Geometry mismatch is a ValueError (survives python -O), not assert."""
    cfg = _tiny_cfg()
    params = jax.device_get(PRM.init_params(cfg, jax.random.PRNGKey(0)))
    path = str(tmp_path / "a.bin")
    C.save_checkpoint(path, params, cfg)
    wrong = cfg.replace(num_layers=3)
    with pytest.raises(ValueError, match="num_layers"):
        C.load_checkpoint(path, wrong)


# ---------------------------------------------------------------------------
# held-out GPT validation split (VERDICT weak #3)
# ---------------------------------------------------------------------------

def test_token_holdout_never_trained_on():
    toks = np.arange(1, 2049, dtype=np.uint16) % 97
    T, holdout = 16, 32
    loader = TOK.TokenLoader(toks, batch_size=8, seq_len=T, holdout=holdout)
    total, train_w = loader.windows_total, loader.windows_train
    assert train_w == total - holdout
    reserved_start = train_w * T
    # walk several epochs of the training wrap: no window may start in the tail
    for _ in range(3 * train_w // 8 + 2):
        xb, _ = loader.next_batch()
        starts = [int(np.where(toks == xb[i, 0])[0][0]) if xb[i, 0] != 0 else 0
                  for i in range(xb.shape[0])]
        for s in starts:
            assert s < reserved_start

    val = TOK.TokenLoader(toks, batch_size=8, seq_len=T, holdout=holdout,
                          val=True)
    xb, yb = val.next_batch()
    # val windows come from the reserved tail only
    want = np.stack([toks[(train_w + i) * T:(train_w + i) * T + T]
                     for i in range(8)]).astype(np.int32)
    np.testing.assert_array_equal(xb, want)


def test_token_holdout_guards():
    toks = np.arange(2049, dtype=np.uint16) % 97
    with pytest.raises(AssertionError):
        TOK.TokenLoader(toks, 8, 16, holdout=0, val=True)
    with pytest.raises(AssertionError):
        TOK.TokenLoader(toks, 8, 16, holdout=10 ** 6)  # no training data left


# ---------------------------------------------------------------------------
# EMA persist/resume (ADVICE low #2)
# ---------------------------------------------------------------------------

def test_ema_kill_and_resume_matches_uninterrupted(tmp_path):
    from vitrs_tpu.train.loop import TrainConfig, train
    from vitrs_tpu import checkpoint_tree as CT
    common = dict(preset="vit-tiny-4-cifar10", dataset="cifar10",
                  steps=4, batch_size=16, lr=1e-3, warmup=2, dtype="float32",
                  log_every=2, eval_every=0, seed=1, ema_decay=0.9,
                  model_overrides=dict(num_layers=2, channels=32, num_heads=2,
                                       use_flash=False))
    w1 = str(tmp_path / "straight")
    train(TrainConfig(workdir=w1, ckpt_every=4, **common))
    w2 = str(tmp_path / "resumed")
    train(TrainConfig(workdir=w2, ckpt_every=2, run_steps=2, **common))
    train(TrainConfig(workdir=w2, ckpt_every=2, **common))
    e1, _ = CT.load_tree(os.path.join(w1, "ema_00000004.tree"))
    e2, _ = CT.load_tree(os.path.join(w2, "ema_00000004.tree"))
    flat1, _ = jax.tree.flatten(e1)
    flat2, _ = jax.tree.flatten(e2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# MAE decoder geometry threading (VERDICT weak #5)
# ---------------------------------------------------------------------------

def test_mae_custom_decoder_geometry_roundtrips():
    from vitrs_tpu.models import mae as MAE
    cfg = _tiny_cfg()
    dcfg = MAE.decoder_config(cfg, width=64, depth=3)
    k = jax.random.PRNGKey(0)
    params = {"encoder": PRM.init_params(cfg, k),
              "decoder": MAE.init_decoder_params(cfg, dcfg, k)}
    imgs = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, cfg.img_size, cfg.img_size, 3), dtype=np.float32))
    # works WITHOUT passing dcfg — geometry inferred from the params
    loss = MAE.mae_loss(params, imgs, cfg, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # and a wrong explicit dcfg fails loudly instead of silently mismatching
    with pytest.raises(ValueError, match="decoder params geometry"):
        MAE.mae_forward(params, imgs, cfg, jax.random.PRNGKey(1),
                        dcfg=MAE.decoder_config(cfg, width=128, depth=3))


# ---------------------------------------------------------------------------
# single-program flat-API forward (VERDICT weak #4)
# ---------------------------------------------------------------------------

def test_forward_returns_logits_and_loss_one_program():
    from vitrs_tpu.vit import ViT
    model = ViT.from_config(_tiny_cfg())
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32, 32, 3), dtype=np.float32)
    y = rng.integers(0, 10, (2,))
    loss = model.forward(x, y)
    assert loss > 0
    logits_sep = np.asarray(model._jit_logits(model.params, jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(model.logits), logits_sep,
                               rtol=1e-5, atol=1e-6)
    loss_sep = float(model._jit_loss(model.params, jnp.asarray(x),
                                     jnp.asarray(y)))
    np.testing.assert_allclose(loss, loss_sep, rtol=1e-6)
