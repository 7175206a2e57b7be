"""AOT export/serve round-trip: serialized forward must reproduce the live
model's logits with no model code at load time."""

import jax
import numpy as np

from vitrs_tpu import params as P
from vitrs_tpu.config import get_config
from vitrs_tpu.models import model as M
from vitrs_tpu import serving

import jax.numpy as jnp


def test_vit_export_roundtrip(tmp_path):
    cfg = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
        num_layers=2, channels=32, num_heads=2)
    params = P.init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "model.vitrs")
    serving.export_forward(params, cfg, batch_size=4, path=path)

    served = serving.ServedModel(path)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 32, 32, 3), dtype=np.float32)
    got = np.asarray(served(x))
    want = np.asarray(M.vit_forward(params, jnp.asarray(x), cfg, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_gpt_export_roundtrip(tmp_path):
    cfg = get_config("gpt-nano", use_flash=False)
    params = P.init_params(cfg, jax.random.PRNGKey(1))
    path = str(tmp_path / "gpt.vitrs")
    serving.export_forward(params, cfg, batch_size=2, path=path)
    served = serving.ServedModel(path)
    rng = np.random.default_rng(1)
    tok = rng.integers(0, cfg.vocab_size, (2, cfg.max_seq_len))
    got = np.asarray(served(tok))
    want = np.asarray(M.gpt_forward(params, jnp.asarray(tok), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_shape_mismatch_rejected(tmp_path):
    cfg = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
        num_layers=1, channels=32, num_heads=2)
    params = P.init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "m.vitrs")
    serving.export_forward(params, cfg, batch_size=4, path=path)
    served = serving.ServedModel(path)
    import pytest
    with pytest.raises(AssertionError, match="expected"):
        served(np.zeros((2, 32, 32, 3), np.float32))
