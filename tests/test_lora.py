"""LoRA finetuning (models/lora.py): zero-init identity, adapter-only
training with a frozen base, merge equivalence, persistence, and
composition with GQA/rope configs."""

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu import checkpoint_tree as CT
from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.models import lora as LO
from vitrs_tpu.models import model as M

CFG = get_config("gpt-nano", use_flash=False)


def _data(cfg, seed=0, B=4, T=16):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    return x, jnp.asarray(np.roll(np.asarray(x), -1, axis=1))


def test_zero_init_is_identity():
    params = PRM.init_params(CFG, jax.random.PRNGKey(0))
    lora = LO.init_lora(CFG, jax.random.PRNGKey(1), rank=4)
    merged = LO.apply_lora(params, lora)
    x, _ = _data(CFG)
    np.testing.assert_allclose(np.asarray(M.gpt_forward(merged, x, CFG)),
                               np.asarray(M.gpt_forward(params, x, CFG)),
                               rtol=1e-6)


def test_lora_trains_with_frozen_base():
    params = PRM.init_params(CFG, jax.random.PRNGKey(0))
    base_snapshot = jax.tree_util.tree_map(np.asarray, params)
    lora = LO.init_lora(CFG, jax.random.PRNGKey(1), rank=4)
    m, v = LO.init_lora_opt(lora)
    x, y = _data(CFG, 1)
    losses = []
    for step in range(12):
        loss, lora, m, v = LO.lora_train_step(
            lora, m, v, jnp.asarray(step), params, x, y, CFG, lr=3e-3)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    # base weights are untouched by construction — pin it anyway
    for name in params:
        np.testing.assert_array_equal(np.asarray(params[name]),
                                      base_snapshot[name])
    # and the adapters actually moved
    assert float(jnp.abs(lora["qkvw_b"]).max()) > 0


def test_merge_matches_apply():
    params = PRM.init_params(CFG, jax.random.PRNGKey(2))
    lora = LO.init_lora(CFG, jax.random.PRNGKey(3), rank=4)
    # give B nonzero content so the merge is nontrivial
    lora = {k: (t if k.endswith("_a")
                else t + 0.01 * jax.random.normal(jax.random.PRNGKey(4),
                                                  t.shape))
            for k, t in lora.items()}
    x, _ = _data(CFG, 2)
    merged = LO.merge_lora(params, lora)
    np.testing.assert_allclose(
        np.asarray(M.gpt_forward(merged, x, CFG)),
        np.asarray(M.gpt_forward(LO.apply_lora(params, lora), x, CFG)),
        rtol=1e-6)
    # merged differs from base (adapters are live)
    assert not np.allclose(np.asarray(M.gpt_forward(merged, x, CFG)),
                           np.asarray(M.gpt_forward(params, x, CFG)))


def test_lora_state_roundtrip(tmp_path):
    lora = LO.init_lora(CFG, jax.random.PRNGKey(5), rank=2)
    path = str(tmp_path / "lora.npz")
    CT.save_tree(path, lora, meta={"alpha": 16.0, "rank": 2})
    loaded, meta = CT.load_tree(path)
    assert meta["rank"] == 2
    for k in lora:
        np.testing.assert_array_equal(np.asarray(lora[k]),
                                      np.asarray(loaded[k]))


def test_lora_composes_with_gqa_and_rope():
    cfg = get_config("gpt-nano", use_flash=False, num_heads=4, channels=32,
                     num_kv_heads=2, pos_emb="rope")
    params = PRM.init_params(cfg, jax.random.PRNGKey(6))
    lora = LO.init_lora(cfg, jax.random.PRNGKey(7), rank=4)
    assert lora["qkvw_a"].shape == (cfg.num_layers, 4, cfg.channels)
    assert lora["qkvw_b"].shape == (cfg.num_layers, cfg.qkv_dim, 4)
    m, v = LO.init_lora_opt(lora)
    x, y = _data(cfg, 3)
    losses = []
    for s in range(10):
        l, lora, m, v = LO.lora_train_step(lora, m, v, jnp.asarray(s), params,
                                           x, y, cfg, lr=3e-3)
        losses.append(float(l))
    assert losses[-1] < losses[0], losses
