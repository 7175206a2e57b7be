"""int8 post-training quantization (ops/quant.py, models/quantized.py).

Bounds the quantization error at op level, proves the quantized forwards
track the float model, and checks the serving contract (int8 leaves, scale
shapes, dequant round-trip).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.models import model as M
from vitrs_tpu.models import quantized as Q
from vitrs_tpu.ops import basic, quant


def test_quantize_weight_roundtrip_bound():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(8, 16, 32)).astype(np.float32))
    wq, scale = quant.quantize_weight(w)
    assert wq.dtype == jnp.int8 and scale.shape == (8, 16)
    deq = np.asarray(wq, np.float32) * np.asarray(scale)[..., None]
    # symmetric rounding: per-element error <= scale/2
    err = np.abs(deq - np.asarray(w))
    assert (err <= np.asarray(scale)[..., None] / 2 + 1e-7).all()


def test_quantize_zero_rows_safe():
    w = jnp.zeros((4, 8))
    wq, scale = quant.quantize_weight(w)
    assert np.asarray(scale).min() > 0          # no div-by-zero scales
    assert (np.asarray(wq) == 0).all()


def test_linear_w8_matches_dequant_linear():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(16,)).astype(np.float32))
    wq, scale = quant.quantize_weight(w)
    deq = wq.astype(jnp.float32) * scale[:, None]
    np.testing.assert_allclose(
        np.asarray(quant.linear_w8(x, wq, scale, b)),
        np.asarray(basic.linear(x, deq, b)), rtol=1e-5, atol=1e-5)


def test_linear_w8a8_tracks_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(96, 128)).astype(np.float32))
    wq, scale = quant.quantize_weight(w)
    got = np.asarray(quant.linear_w8a8(x, wq, scale))
    ref = np.asarray(basic.linear(x, w))
    # int8 x int8: relative error ~1% on gaussian data
    denom = np.abs(ref).mean()
    assert np.abs(got - ref).mean() / denom < 0.02


@pytest.mark.parametrize("mode", ["vit", "gpt"])
def test_quantize_params_layout(mode):
    preset = "vit-tiny-4-cifar10" if mode == "vit" else "gpt-nano"
    cfg = get_config(preset, use_flash=False)
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))
    qp = quant.quantize_params(params, mode=mode)
    keys = (quant._QUANT_KEYS_VIT if mode == "vit"
            else quant._QUANT_KEYS_GPT)
    for k in keys:
        if k in params:
            assert qp[k].dtype == jnp.int8
            assert qp[k + "_scale"].shape == params[k].shape[:-1]
    # non-quantized leaves pass through untouched
    np.testing.assert_array_equal(np.asarray(qp["ln1w"]),
                                  np.asarray(params["ln1w"]))
    # dequant round-trip stays within the rounding bound
    deq = quant.dequantize_params(qp)
    for k in keys:
        if k in params:
            scale = np.asarray(qp[k + "_scale"])[..., None]
            err = np.abs(np.asarray(deq[k]) - np.asarray(params[k]))
            assert (err <= scale / 2 + 1e-7).all(), k


@pytest.mark.parametrize("w8a8", [False, True], ids=["w8", "w8a8"])
def test_vit_forward_q_tracks_float(w8a8):
    cfg = get_config("vit-tiny-4-cifar10", use_flash=False, num_layers=2,
                     channels=64, num_heads=2)
    params = PRM.init_params(cfg, jax.random.PRNGKey(3))
    qp = quant.quantize_params(params, mode="vit")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3), dtype=np.float32))
    ref = np.asarray(M.vit_forward(params, x, cfg))
    got = np.asarray(Q.vit_forward_q(qp, x, cfg, w8a8=w8a8))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < (0.08 if w8a8 else 0.04), rel


@pytest.mark.parametrize("w8a8", [False, True], ids=["w8", "w8a8"])
def test_gpt_forward_q_tracks_float(w8a8):
    cfg = get_config("gpt-nano", use_flash=False)
    params = PRM.init_params(cfg, jax.random.PRNGKey(5))
    qp = quant.quantize_params(params, mode="gpt")
    rng = np.random.default_rng(6)
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)))
    ref = np.asarray(M.gpt_forward(params, toks, cfg))
    got = np.asarray(Q.gpt_forward_q(qp, toks, cfg, w8a8=w8a8))
    rel = np.abs(got - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < (0.08 if w8a8 else 0.04), rel
