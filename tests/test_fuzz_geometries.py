"""Property/fuzz tests: the model must be well-defined (finite loss, finite
grads, correct shapes) across arbitrary small geometries — odd head counts,
non-square-friendly patches, mean vs cls pooling, depths 1..3 — not just the
blessed presets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu import params as P
from vitrs_tpu.config import ViTConfig
from vitrs_tpu.models import model as M

GEOMETRIES = [
    # (img, patch, channels, heads, layers, pool, classes)
    (16, 4, 24, 1, 1, "cls", 5),
    (16, 8, 48, 3, 2, "mean", 7),
    (28, 7, 32, 2, 2, "cls", 11),
    (32, 16, 64, 4, 3, "mean", 3),
    (24, 4, 36, 3, 1, "cls", 2),
    (32, 8, 40, 2, 2, "mean", 13),
]


@pytest.mark.parametrize("img,patch,ch,heads,layers,pool,classes", GEOMETRIES)
def test_vit_geometry(img, patch, ch, heads, layers, pool, classes):
    n_tok = (img // patch) ** 2 + (1 if pool == "cls" else 0)
    cfg = ViTConfig(mode="vit", img_size=img, patch_size=patch, channels=ch,
                    num_heads=heads, num_layers=layers, pool=pool,
                    num_classes=classes, max_seq_len=n_tok, vocab_size=classes,
                    use_flash=False).validate()
    params = P.init_params(cfg, jax.random.PRNGKey(img * patch + ch))
    rng = np.random.default_rng(0)
    B = 3
    x = jnp.asarray(rng.standard_normal((B, img, img, 3), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, classes, (B,)))
    logits = M.vit_forward(params, x, cfg, train=False)
    assert logits.shape == (B, classes)
    assert np.all(np.isfinite(np.asarray(logits)))
    loss, grads = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), k
    # every trainable tensor that participates must receive gradient
    for k in ("patchw", "qkvw", "fcw", "headw", "wpe", "lnfw"):
        assert np.abs(np.asarray(grads[k])).max() > 0, k


@pytest.mark.parametrize("T,V,heads,ch", [(4, 11, 1, 8), (7, 31, 3, 12),
                                          (16, 97, 2, 16), (9, 13, 4, 16)])
def test_gpt_geometry(T, V, heads, ch):
    cfg = ViTConfig(mode="gpt", max_seq_len=T, vocab_size=V, num_heads=heads,
                    channels=ch, num_layers=2, use_flash=False).validate()
    params = P.init_params(cfg, jax.random.PRNGKey(T * V))
    rng = np.random.default_rng(1)
    tok = jnp.asarray(rng.integers(0, V, (2, T)))
    tgt = jnp.asarray(rng.integers(0, V, (2, T)))
    loss, grads = jax.value_and_grad(M.gpt_loss)(params, tok, tgt, cfg)
    assert np.isfinite(float(loss))
    assert float(loss) < np.log(V) * 3   # sane magnitude at init
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), k


def test_causality_property():
    """Changing future tokens must not change past logits (gpt mode)."""
    cfg = ViTConfig(mode="gpt", max_seq_len=8, vocab_size=29, num_heads=2,
                    channels=16, num_layers=2, use_flash=False).validate()
    params = P.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    tok = rng.integers(0, 29, (1, 8))
    tok2 = tok.copy()
    tok2[0, 5:] = rng.integers(0, 29, 3)        # perturb the future
    l1 = np.asarray(M.gpt_forward(params, jnp.asarray(tok), cfg))
    l2 = np.asarray(M.gpt_forward(params, jnp.asarray(tok2), cfg))
    np.testing.assert_allclose(l1[:, :5], l2[:, :5], atol=1e-5)
    assert np.abs(l1[:, 5:] - l2[:, 5:]).max() > 1e-3


def test_permutation_equivariance_of_mean_pool():
    """Mean-pool ViT without positional embeddings is patch-permutation
    invariant — a strong structural check on the attention + pool path."""
    cfg = ViTConfig(mode="vit", img_size=16, patch_size=4, channels=24,
                    num_heads=2, num_layers=2, pool="mean", num_classes=5,
                    max_seq_len=16, vocab_size=5, use_flash=False).validate()
    params = P.init_params(cfg, jax.random.PRNGKey(1))
    params["wpe"] = jnp.zeros_like(params["wpe"])   # kill position info
    rng = np.random.default_rng(4)
    img = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    from vitrs_tpu.ops import basic
    patches = np.asarray(basic.patchify(jnp.asarray(img), 4))   # (1,16,48)
    perm = rng.permutation(16)
    shuffled = basic.unpatchify(jnp.asarray(patches[:, perm]), 4, 16, 3)
    l1 = np.asarray(M.vit_forward(params, jnp.asarray(img), cfg))
    l2 = np.asarray(M.vit_forward(params, shuffled, cfg))
    np.testing.assert_allclose(l1, l2, atol=1e-4)


# round-3 variant space: GQA x rope x window x remat must be well-defined
# for arbitrary small geometries, not just the blessed test configs
VARIANTS = [
    # (T, V, heads, kv_heads, ch, window, pos_emb, remat, experts, top_k)
    (8, 17, 4, 2, 16, 0, "rope", False, 0, 0),
    (12, 29, 6, 3, 24, 5, "learned", True, 0, 0),
    (16, 11, 4, 1, 32, 7, "rope", True, 0, 0),
    (10, 53, 2, 2, 16, 3, "rope", False, 0, 0),   # kv==heads: MHA via field
    (9, 13, 3, 1, 12, 4, "learned", False, 0, 0), # odd T, MQA
    # round-5: MoE enters the fuzz space (verdict #5) — MoE x GQA x rope x
    # window, and MoE x MQA x remat at an odd T
    (12, 19, 4, 2, 16, 5, "rope", False, 4, 2),
    (9, 23, 3, 1, 12, 0, "learned", True, 3, 1),
    (16, 31, 2, 2, 16, 6, "rope", True, 2, 2),    # top_k == E dense-limit
]


@pytest.mark.parametrize("T,V,heads,kv,ch,window,pos_emb,remat,experts,top_k",
                         VARIANTS)
def test_gpt_variant_geometry(T, V, heads, kv, ch, window, pos_emb, remat,
                              experts, top_k):
    cfg = ViTConfig(mode="gpt", max_seq_len=T, vocab_size=V, num_layers=2,
                    num_heads=heads, channels=ch, num_kv_heads=kv,
                    window=window, pos_emb=pos_emb, remat=remat,
                    num_experts=experts, moe_top_k=top_k,
                    moe_cap_factor=4.0 if experts else 1.25,
                    use_flash=False).validate()
    params = P.init_params(cfg, jax.random.PRNGKey(T * V + ch))
    rng = np.random.default_rng(1)
    B = 2
    x = jnp.asarray(rng.integers(0, V, (B, T)))
    y = jnp.asarray(rng.integers(0, V, (B, T)))
    logits = M.gpt_forward(params, x, cfg)
    assert logits.shape == (B, T, V)
    assert np.all(np.isfinite(np.asarray(logits)))
    loss, grads = jax.value_and_grad(M.gpt_loss)(params, x, y, cfg)
    assert np.isfinite(float(loss))
    for k, g in grads.items():
        assert np.all(np.isfinite(np.asarray(g))), k
    for k in ("wte", "qkvw", "fcw", "lnfw") + (
            ("routerw",) if experts else ()):
        assert np.abs(np.asarray(grads[k])).max() > 0, k
    if pos_emb == "rope":
        np.testing.assert_array_equal(np.asarray(grads["wpe"]), 0.0)
    # the cache decode path agrees with the full forward for every variant
    from vitrs_tpu.models import generate as G
    caches = G.init_kv_cache(cfg, B, T)
    lg, _ = G.forward_with_cache(params, x, caches, 0, cfg)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(logits),
                               rtol=3e-4, atol=2e-4)
