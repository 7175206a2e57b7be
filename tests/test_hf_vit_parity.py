"""Cross-framework parity: our ViT path vs torch ViT on identical weights.

A randomly-initialized `transformers` ViTForImageClassification (no network
needed) is converted via models/import_hf.convert_vit_state_dict; logits must
match torch's forward — the vision-side analogue of tests/test_hf_parity.py,
closing the BASELINE.json configs[1] 'pretrained weights' seam (the
checkpoint-loading contract of reference train_vit.rs:89-186 generalized
to the HF ViT family)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from vitrs_tpu import params as P
from vitrs_tpu.models import import_hf as IH
from vitrs_tpu.models import model as M
from vitrs_tpu.ops import basic


@pytest.fixture(scope="module")
def hf_vit():
    cfg_hf = transformers.ViTConfig(
        image_size=16, patch_size=4, num_channels=3,
        hidden_size=48, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=192, hidden_act="gelu",       # exact erf GELU
        layer_norm_eps=1e-5,                            # match LN_EPS
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        num_labels=7)
    torch.manual_seed(0)
    return transformers.ViTForImageClassification(cfg_hf).eval()


def _convert(hf_vit):
    cfg = IH.config_from_hf_vit(hf_vit.config).replace(use_flash=False)
    params = {k: jnp.asarray(v) for k, v in
              IH.convert_vit_state_dict(hf_vit.state_dict(), cfg).items()}
    return cfg, params


def test_vit_logits_match_torch(hf_vit):
    cfg, params = _convert(hf_vit)
    assert cfg.act == "gelu_erf"
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf_vit(torch.tensor(imgs.transpose(0, 3, 1, 2))).logits.numpy()
    got = np.asarray(M.vit_forward(params, jnp.asarray(imgs), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_vit_geometry_roundtrip(hf_vit):
    cfg, params = _convert(hf_vit)
    shapes = P.param_shapes(cfg)
    for name in P.tensor_order(cfg):
        assert tuple(params[name].shape) == shapes[name], name


def test_erf_gelu_matches_torch():
    x = torch.linspace(-4, 4, 257, dtype=torch.float32)
    want = torch.nn.functional.gelu(x).numpy()
    got = np.asarray(basic.gelu_erf(jnp.asarray(x.numpy())))
    # f32 erf implementations differ in the last ulps at the tails
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_erf_gelu_cv_gradient():
    """Custom-VJP gradient == autodiff of the plain erf-GELU expression."""
    x = jnp.asarray(np.random.default_rng(1).standard_normal(64),
                    jnp.float32)
    g_cv = jax.grad(lambda t: jnp.sum(basic.gelu_erf_cv(t)))(x)
    ref = lambda t: jnp.sum(0.5 * t * (1.0 + jax.lax.erf(
        t * basic.INV_SQRT2)))
    g_ad = jax.grad(ref)(x)
    np.testing.assert_allclose(np.asarray(g_cv), np.asarray(g_ad),
                               rtol=1e-5, atol=1e-6)


def test_act_flag_selects_erf_in_block(hf_vit):
    """cfg.act='gelu_erf' must change the forward (vs tanh) and match torch
    only in erf mode — guards against the flag silently not threading."""
    cfg, params = _convert(hf_vit)
    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
    erf_logits = M.vit_forward(params, imgs, cfg)
    tanh_logits = M.vit_forward(params, imgs, cfg.replace(act="gelu_tanh"))
    assert not np.allclose(np.asarray(erf_logits), np.asarray(tanh_logits),
                           atol=1e-6)


def test_selective_remat_grads_match_erf(hf_vit):
    """Selective-remat backward must use the same erf activation: grads of
    the remat path == grads of the plain path on imported weights."""
    cfg, params = _convert(hf_vit)
    rng = np.random.default_rng(3)
    imgs = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, (2,)))

    def loss(p, c):
        return M.vit_loss(p, imgs, labels, c, train=False)

    g_plain = jax.grad(loss)(params, cfg)
    g_remat = jax.grad(loss)(params, cfg.replace(remat=True))
    for k in g_plain:
        np.testing.assert_allclose(np.asarray(g_remat[k]),
                                   np.asarray(g_plain[k]),
                                   rtol=2e-5, atol=2e-6, err_msg=k)


def test_vit_export_roundtrips_import(hf_vit):
    """export_vit_state_dict inverts convert_vit_state_dict bitwise (wte is
    the vit-mode zero filler and is not exported), and the export loads
    into a fresh torch ViTForImageClassification with logits parity."""
    model = hf_vit
    cfg = IH.config_from_hf_vit(model.config).replace(use_flash=False)
    params = IH.convert_vit_state_dict(model.state_dict(), cfg)
    sd = IH.export_vit_state_dict(params, cfg)
    back = IH.convert_vit_state_dict(sd, cfg)
    for k in params:
        np.testing.assert_array_equal(params[k], back[k], err_msg=k)

    m2 = transformers.ViTForImageClassification(model.config)
    missing, unexpected = m2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True)
    assert not missing and not unexpected
    m2.eval()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, cfg.img_size, cfg.img_size, 3),
                            dtype=np.float32)
    with torch.no_grad():
        want = m2(torch.from_numpy(x.transpose(0, 3, 1, 2))).logits.numpy()
    got = np.asarray(M.vit_forward(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
