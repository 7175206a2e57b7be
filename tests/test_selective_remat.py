"""Selective rematerialization (models/selective.py): gradient parity vs the
plain path, the interpret-mode flash branches vs a dense jnp oracle, and the
phantom-head padding that makes odd head counts (GPT-2 1.5B: 25) tileable."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.models import model as M
from vitrs_tpu.models import selective as S
from vitrs_tpu.ops import basic
from vitrs_tpu.ops import flash_attention as FA


def _grads_close(g1, g2, rtol=2e-4, atol=2e-5):
    flat1, t1 = jax.tree_util.tree_flatten(g1)
    flat2, t2 = jax.tree_util.tree_flatten(g2)
    assert t1 == t2
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# model-level: cfg.remat=True grads == cfg.remat=False grads (VERDICT r2 #1)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["gpt", "vit"])
def test_selective_remat_grads_match_plain(mode):
    if mode == "gpt":
        cfg = get_config("gpt-nano", use_flash=False)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)))
        y = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)))
    else:
        cfg = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
            num_layers=2, channels=32, num_heads=2)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3), dtype=np.float32))
        y = jnp.asarray(rng.integers(0, 10, (2,)))
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))

    def loss(p, c):
        return M.loss_fn(p, x, y, c)

    l0, g0 = jax.value_and_grad(loss)(params, cfg)
    l1, g1 = jax.value_and_grad(loss)(params, cfg.replace(remat=True))
    lf, gf = jax.value_and_grad(loss)(params, cfg.replace(remat="full"))
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    np.testing.assert_allclose(float(l0), float(lf), rtol=1e-6)
    _grads_close(g0, g1, rtol=1e-4, atol=1e-6)
    _grads_close(g0, gf, rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# branch-level: interpret-mode flash branches vs dense jnp oracle
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal,T", [(True, 16), (False, 17)])
def test_attn_branch_flash_grads_match_dense(causal, T):
    C, H = 32, 2
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, T, C), dtype=np.float32))
    w = {
        "ln1w": jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.1 + 1),
        "ln1b": jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.1),
        "qkvw": jnp.asarray(rng.standard_normal((3 * C, C), dtype=np.float32) * 0.2),
        "qkvb": jnp.asarray(rng.standard_normal(3 * C, dtype=np.float32) * 0.1),
        "attprojw": jnp.asarray(rng.standard_normal((C, C), dtype=np.float32) * 0.2),
        "attprojb": jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.1),
    }
    args = (x, w["ln1w"], w["ln1b"], w["qkvw"], w["qkvb"], w["attprojw"],
            w["attprojb"])

    def f_flash(*a):
        return jnp.sum(jnp.sin(S.attn_branch(*a, H, causal, True)))

    def f_ref(*a):
        return jnp.sum(jnp.sin(S._attn_ref(*a, num_heads=H, causal=causal)))

    np.testing.assert_allclose(float(f_flash(*args)), float(f_ref(*args)),
                               rtol=2e-5)
    _grads_close(jax.grad(f_flash, argnums=tuple(range(7)))(*args),
                 jax.grad(f_ref, argnums=tuple(range(7)))(*args),
                 rtol=3e-4, atol=3e-5)


def test_mlp_branch_grads_match_autodiff():
    C = 24
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 5, C), dtype=np.float32))
    args = (x,
            jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.1 + 1),
            jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.1),
            jnp.asarray(rng.standard_normal((4 * C, C), dtype=np.float32) * 0.2),
            jnp.asarray(rng.standard_normal(4 * C, dtype=np.float32) * 0.1),
            jnp.asarray(rng.standard_normal((C, 4 * C), dtype=np.float32) * 0.2),
            jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.1))

    def ref(x, ln2w, ln2b, fcw, fcb, fcprojw, fcprojb):
        ln2, _, _ = basic.layernorm(x, ln2w, ln2b)
        return basic.linear(basic.gelu(basic.linear(ln2, fcw, fcb)),
                            fcprojw, fcprojb)

    def f_sel(*a):
        return jnp.sum(jnp.sin(S.mlp_branch(*a)))

    def f_ref(*a):
        return jnp.sum(jnp.sin(ref(*a)))

    np.testing.assert_allclose(float(f_sel(*args)), float(f_ref(*args)),
                               rtol=1e-6)
    _grads_close(jax.grad(f_sel, argnums=tuple(range(7)))(*args),
                 jax.grad(f_ref, argnums=tuple(range(7)))(*args),
                 rtol=1e-4, atol=1e-6)


# ---------------------------------------------------------------------------
# phantom-head padding (odd head counts, advisor r2 #2)
# ---------------------------------------------------------------------------

def test_padded_num_heads():
    assert FA.padded_num_heads(12, 64) == 12        # already supported
    assert FA.padded_num_heads(25, 64) == 26        # GPT-2 1.5B
    assert FA.padded_num_heads(3, 64) == 4
    assert FA.padded_num_heads(5, 128) == 5         # D >= LANES: any count
    assert FA.padded_num_heads(2, 48) is None       # D not a lane divisor


def test_phantom_heads_match_dense_fwd_bwd():
    """flash_attention_qkv with 3 heads of 64 (needs padding to 4) must equal
    dense attention exactly on values and grads — interpret mode on CPU."""
    B, T, H, D = 2, 16, 3, 64
    C = H * D
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * C), dtype=np.float32))

    def f_flash(q):
        return jnp.sum(jnp.cos(FA.flash_attention_qkv(q, H, causal=True,
                                                      interpret=True)))

    def f_dense(q):
        out, _ = basic.attention_dense(q, H, causal=True)
        return jnp.sum(jnp.cos(out))

    np.testing.assert_allclose(float(f_flash(qkv)), float(f_dense(qkv)),
                               rtol=2e-5)
    np.testing.assert_allclose(np.asarray(jax.grad(f_flash)(qkv)),
                               np.asarray(jax.grad(f_dense)(qkv)),
                               rtol=3e-4, atol=3e-5)


def test_fused_qkv_attention_phantom_heads():
    """The fused projection+attention op with 3 heads (padded to 4): values
    and all grads match the plain dense composition."""
    from vitrs_tpu.ops.fused_qkv_attention import qkv_attention
    B, T, H, D = 2, 12, 3, 64
    C = H * D
    rng = np.random.default_rng(4)
    ln1 = jnp.asarray(rng.standard_normal((B, T, C), dtype=np.float32))
    qkvw = jnp.asarray(rng.standard_normal((3 * C, C), dtype=np.float32) * 0.1)
    qkvb = jnp.asarray(rng.standard_normal(3 * C, dtype=np.float32) * 0.1)

    def f_fused(a, w, b):
        return jnp.sum(jnp.sin(qkv_attention(a, w, b, H, True, True)))

    def f_ref(a, w, b):
        out, _ = basic.attention_dense(basic.linear(a, w, b), H, causal=True)
        return jnp.sum(jnp.sin(out))

    np.testing.assert_allclose(float(f_fused(ln1, qkvw, qkvb)),
                               float(f_ref(ln1, qkvw, qkvb)), rtol=2e-5)
    _grads_close(jax.grad(f_fused, argnums=(0, 1, 2))(ln1, qkvw, qkvb),
                 jax.grad(f_ref, argnums=(0, 1, 2))(ln1, qkvw, qkvb),
                 rtol=3e-4, atol=3e-5)


def test_1558m_preset_head_geometry_is_tileable():
    cfg = get_config("gpt2-1558m")
    assert FA.padded_num_heads(cfg.num_heads, cfg.head_size) == 26
