"""Memory-model tests: canonical 16-tensor layout and parameter-count pin.

Mirrors /root/reference/tests/vit_tests.rs:5-16 (test_build_from_checkpoint):
the GPT-2 124M config must yield exactly 124,439,808 parameters."""

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu import params as P
from vitrs_tpu.config import get_config


def test_param_count_pin():
    cfg = get_config("gpt2-124m")
    assert cfg.max_seq_len == 1024
    assert cfg.vocab_size == 50257
    assert cfg.num_layers == 12
    assert cfg.num_heads == 12
    assert cfg.channels == 768
    assert P.num_parameters(cfg) == 124_439_808


def test_canonical_order_is_reference_order():
    assert P.CANONICAL_16 == (
        "wte", "wpe", "ln1w", "ln1b", "qkvw", "qkvb", "attprojw", "attprojb",
        "ln2w", "ln2b", "fcw", "fcb", "fcprojw", "fcprojb", "lnfw", "lnfb")


def test_flatten_roundtrip():
    cfg = get_config("gpt-nano")
    p = P.init_params(cfg, jax.random.PRNGKey(0))
    flat = P.flatten_params(p, cfg)
    assert flat.shape == (P.num_parameters(cfg),)
    p2 = P.unflatten_params(flat, cfg)
    for k in p:
        np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(p2[k]))


def test_flat_layout_matches_canonical_offsets():
    """The flat vector must be byte-compatible with the reference arena:
    tensor n starts at sum(sizes[:n]) (rusty_vit.rs:131-148)."""
    cfg = get_config("gpt-nano")
    p = P.init_params(cfg, jax.random.PRNGKey(1))
    flat = np.asarray(P.flatten_params(p, cfg))
    off = 0
    for name in P.tensor_order(cfg):
        size = int(np.prod(P.param_shapes(cfg)[name]))
        np.testing.assert_array_equal(
            flat[off:off + size], np.asarray(p[name]).reshape(-1))
        off += size


def test_vit_mode_extension_tensors():
    cfg = get_config("vit-tiny-4-cifar10")
    p = P.init_params(cfg, jax.random.PRNGKey(0))
    assert p["patchw"].shape == (192, 4 * 4 * 3)
    assert p["cls"].shape == (1, 1, 192)
    assert p["headw"].shape == (10, 192)
    assert P.tensor_order(cfg)[:16] == P.CANONICAL_16


def test_reference_init_scheme():
    """uniform [0, 0.02) weights, LN=1, biases=0 (rusty_vit.rs:864-903)."""
    cfg = get_config("gpt-nano")
    p = P.init_params(cfg, jax.random.PRNGKey(0), scheme="reference")
    w = np.asarray(p["qkvw"])
    assert w.min() >= 0.0 and w.max() < 0.02
    assert np.all(np.asarray(p["ln1w"]) == 1.0)
    assert np.all(np.asarray(p["qkvb"]) == 0.0)
