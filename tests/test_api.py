"""Flat API tests — the reference's five-call surface (SURVEY.md §3.4):
build/init, forward (mean loss), backward (accumulating grads), optimizer
step, checkpoint round-trip.  Mirrors the forward/backward smoke tests of
tests/vit_tests.rs:18-89 with real assertions."""

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu import ViT, get_config
from vitrs_tpu import params as P

CFG = get_config("gpt-nano", use_flash=False)


def _batch(cfg, B=2, T=8, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.integers(0, cfg.vocab_size, (B, T)),
            rng.integers(0, cfg.vocab_size, (B, T)))


def test_forward_smoke():
    """forward with targets → positive loss; logits/probs finite and nonzero
    (tests/vit_tests.rs:18-50, strengthened)."""
    model = ViT.from_config(CFG, seed=0)
    tokens, targets = _batch(CFG)
    loss = model.forward(tokens, targets)
    assert loss > 0
    logits = np.asarray(model.logits)
    assert logits.shape == (2, 8, CFG.vocab_size)
    assert np.all(np.isfinite(logits)) and not np.allclose(logits, 0)


def test_inference_sentinel():
    """forward without targets → mean_loss == -1.0 (rusty_vit.rs:348-350)."""
    model = ViT.from_config(CFG, seed=0)
    tokens, _ = _batch(CFG)
    assert model.forward(tokens) == -1.0
    assert model.logits is not None


def test_backward_populates_all_16_grads():
    """tests/vit_tests.rs:52-89: all 16 grad tensors exist and are nonzero."""
    model = ViT.from_config(CFG, seed=0)
    tokens, targets = _batch(CFG)
    model.forward(tokens, targets)
    grads = model.backward()
    for name in P.CANONICAL_16:
        g = np.asarray(grads[name])
        assert g.shape == P.param_shapes(CFG)[name]
        assert np.all(np.isfinite(g)), name
        assert np.abs(g).max() > 0, name


def test_backward_accumulates():
    """grads accumulate with += until zero_grad (llm.c contract)."""
    model = ViT.from_config(CFG, seed=0)
    tokens, targets = _batch(CFG)
    model.forward(tokens, targets)
    g1 = np.asarray(model.backward()["qkvw"])
    g2 = np.asarray(model.backward()["qkvw"])
    np.testing.assert_allclose(g2, 2 * g1, rtol=1e-5)
    model.zero_grad()
    assert model.grads is None


def test_sgd_step_matches_reference_update():
    """p -= lr*g (train_vit.rs:737-743)."""
    model = ViT.from_config(CFG, seed=0)
    tokens, targets = _batch(CFG)
    model.forward(tokens, targets)
    grads = model.backward()
    before = np.asarray(model.params["fcw"]).copy()
    g = np.asarray(grads["fcw"])
    model.optimizer_step(lr=0.1, optimizer="sgd")
    after = np.asarray(model.params["fcw"])
    np.testing.assert_allclose(after, before - 0.1 * g, rtol=1e-5, atol=1e-7)


def test_adamw_loss_decreases():
    model = ViT.from_config(CFG, seed=0)
    tokens, targets = _batch(CFG)
    losses = []
    for _ in range(5):
        model.forward(tokens, targets)
        model.zero_grad()
        model.backward()
        model.optimizer_step(lr=1e-2)
        losses.append(model.mean_loss)
    assert losses[-1] < losses[0]


def test_fused_train_step_decreases_loss():
    model = ViT.from_config(CFG, seed=0)
    tokens, targets = _batch(CFG)
    first = model.train_step(tokens, targets, lr=1e-2)
    for _ in range(4):
        last = model.train_step(tokens, targets, lr=1e-2)
    assert last < first
    assert model.step == 5


def test_checkpoint_round_trip_full_state(tmp_path):
    """save → load → identical params, step, m/v — deterministic resume
    (reference aux subsystem 4, SURVEY.md §5)."""
    model = ViT.from_config(CFG, seed=0)
    tokens, targets = _batch(CFG)
    for _ in range(3):
        model.train_step(tokens, targets, lr=1e-2)
    path = str(tmp_path / "ck.bin")
    model.save_checkpoint(path)
    model2 = ViT.build_from_checkpoint(path, use_flash=False)
    assert model2.step == model.step
    for k in model.params:
        np.testing.assert_array_equal(np.asarray(model.params[k]),
                                      np.asarray(model2.params[k]))
    np.testing.assert_array_equal(
        np.asarray(P.flatten_params(model.m, CFG)),
        np.asarray(P.flatten_params(model2.m, CFG)))
    # training continues identically from the restored state
    l1 = model.train_step(tokens, targets, lr=1e-2)
    l2 = model2.train_step(tokens, targets, lr=1e-2)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)


def test_vit_mode_end_to_end():
    """ViT-Tiny-ish on random CIFAR-shaped data: loss decreases."""
    cfg = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
        num_layers=2, channels=32, num_heads=2)
    model = ViT.from_config(cfg, seed=0)
    rng = np.random.default_rng(0)
    images = rng.standard_normal((4, 32, 32, 3), dtype=np.float32)
    labels = rng.integers(0, 10, (4,))
    first = model.train_step(images, labels, lr=1e-3)
    for _ in range(6):
        last = model.train_step(images, labels, lr=1e-3)
    assert last < first
    # inference path
    loss = model.forward(images)
    assert loss == -1.0
    assert model.logits.shape == (4, 10)


def test_drop_path_semantics():
    """Stochastic depth: inert without rng / at eval; with rng + rate it
    perturbs the forward, identity layers (rate 0 at layer 0) survive, and
    gradients stay finite; gpt2-family presets pin the llm.c counts."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    from vitrs_tpu.models import model as M

    cfg = get_config("vit-tiny-4-cifar10", use_flash=False, num_layers=4,
                     channels=64, num_heads=2, drop_path=0.5)
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 10, (8,)))

    eval_logits = M.vit_forward(params, x, cfg, train=False)
    # train WITHOUT rng: drop-path must be inert (deterministic contract)
    no_rng = M.vit_forward(params, x, cfg, train=True)
    np.testing.assert_array_equal(np.asarray(eval_logits), np.asarray(no_rng))
    # with rng: perturbed, different keys -> different drops
    k1 = M.vit_forward(params, x, cfg, train=True, rng=jax.random.PRNGKey(1))
    k2 = M.vit_forward(params, x, cfg, train=True, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(k1), np.asarray(eval_logits))
    assert not np.allclose(np.asarray(k1), np.asarray(k2))
    # grads finite through the dropped scan
    g = jax.grad(M.vit_loss)(params, x, y, cfg, rng=jax.random.PRNGKey(3))
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_gpt2_family_param_counts():
    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    want = {"gpt2-124m": 124_439_808, "gpt2-350m": 354_823_168,
            "gpt2-774m": 774_030_080, "gpt2-1558m": 1_557_611_200}
    for name, n in want.items():
        assert PRM.num_parameters(get_config(name)) == n, name
