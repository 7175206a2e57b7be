"""Round-3 hygiene fixes pinned by tests (ADVICE r2 findings):
batch-independent GPT val split, chunked-mode top_k surfaced at submit(),
decorrelated per-micro-batch drop-path keys under gradient accumulation."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.data import tokens as TOK


# ---------------------------------------------------------------------------
# evaluate_gpt holdout independent of the eval batch size (ADVICE r2 #1)
# ---------------------------------------------------------------------------

def test_default_holdout_is_batch_independent():
    assert TOK.default_holdout(256) == 64
    assert TOK.default_holdout(1 << 20) == 64          # capped
    assert TOK.default_holdout(8) == 2
    assert TOK.default_holdout(1) == 1                 # never zero


def test_evaluate_gpt_same_split_any_batch(tmp_path):
    """Eval with batch 4 and batch 8 must score the SAME reserved tail —
    previously a large eval batch silently widened the 'holdout' into
    windows the training wrap had consumed."""
    from vitrs_tpu.train.loop import evaluate_gpt

    cfg = get_config("gpt-nano", use_flash=False)
    # total_w = 256 windows of T=16 -> holdout = 64, divisible by both batches
    toks = TOK.synthetic_tokens(n=256 * 16 + 1, vocab_size=cfg.vocab_size)
    path = str(tmp_path / "toks.bin")
    toks.astype(np.uint16).tofile(path)
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))

    r4 = evaluate_gpt(cfg, params, data_dir=path, batch=4, max_batches=16)
    r8 = evaluate_gpt(cfg, params, data_dir=path, batch=8, max_batches=8)
    r_big = evaluate_gpt(cfg, params, data_dir=path, batch=512,
                         max_batches=1)   # capped to the 64-window holdout
    assert r4["windows"] == r8["windows"] == r_big["windows"] == 64
    np.testing.assert_allclose(r4["val_loss"], r8["val_loss"], rtol=1e-6)
    np.testing.assert_allclose(r4["val_loss"], r_big["val_loss"], rtol=1e-6)


# ---------------------------------------------------------------------------
# chunked-mode per-request top_k surfaced at the API boundary (ADVICE r2 #3)
# ---------------------------------------------------------------------------

def test_chunked_submit_warns_on_topk_mismatch():
    from vitrs_tpu.serving_gen import GenerationEngine

    cfg = get_config("gpt-nano", use_flash=False)
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))
    eng = GenerationEngine(params, cfg, max_slots=2, max_len=16,
                           prompt_buckets=(4,), decode_chunk=2, top_k=5)
    with pytest.warns(UserWarning, match="top_k=3/top_p=0.0 is ignored"):
        eng.submit(np.arange(4), max_new=2, top_k=3)
    # matching top_k stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        eng.submit(np.arange(4), max_new=2, top_k=5)
    # tick-at-a-time mode honors per-request top_k -> no warning either
    eng1 = GenerationEngine(params, cfg, max_slots=2, max_len=16,
                            prompt_buckets=(4,), decode_chunk=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        eng1.submit(np.arange(4), max_new=2, top_k=3)


# ---------------------------------------------------------------------------
# per-micro-batch drop-path decorrelation under accumulation (ADVICE r2 #4)
# ---------------------------------------------------------------------------

def test_accum_micro_batches_use_distinct_droppath_keys():
    from vitrs_tpu.models import model as M
    from vitrs_tpu.parallel import data_parallel as dp

    cfg = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
        num_layers=3, channels=32, num_heads=2, drop_path=0.5)
    mesh = dp.make_mesh(1)
    params = dp.replicate(PRM.init_params(cfg, jax.random.PRNGKey(0)), mesh)
    m, v = dp.init_sharded_opt_state(cfg, mesh)
    step_fn = dp.make_dp_train_step(cfg, mesh, accum_steps=2)

    rng = np.random.default_rng(0)
    half = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32))
    imgs = jnp.concatenate([half, half])          # micro 0 == micro 1
    lab_half = jnp.asarray(rng.integers(0, 10, 8))
    labels = jnp.concatenate([lab_half, lab_half])
    step = jnp.asarray(7, jnp.int32)
    _, _, _, loss = step_fn(params, m, v, dp.shard_batch(imgs, mesh),
                            dp.shard_batch(labels, mesh), step,
                            jnp.asarray(0.0, jnp.float32),
                            jnp.asarray(0.0, jnp.float32))

    # replicate the step's key derivation: fold (step, device=0, micro)
    params_h = PRM.init_params(cfg, jax.random.PRNGKey(0))
    base = jax.random.fold_in(jax.random.PRNGKey(0xDA7A), step)
    base = jax.random.fold_in(base, 0)
    losses = [float(M.loss_fn(params_h, half, lab_half, cfg,
                              rng=jax.random.fold_in(base, mi)))
              for mi in (0, 1)]
    # identical inputs, distinct micro keys -> distinct per-micro losses,
    # and the step reports their mean (the decorrelated accumulation)
    assert abs(losses[0] - losses[1]) > 1e-6, (
        "micro-batches reused one drop-path mask pattern")
    np.testing.assert_allclose(float(loss), np.mean(losses), rtol=1e-5)
