"""GQA/MQA-native flash kernels (ops/flash_attention_gqa.py) vs the
expansion path — forward values, all three fused-op gradients, single- and
multi-tile, causal/window/rope, combined and pair backwards.

Ground truth is the repo's own expansion construction (GQA == MHA with K/V
replicated per query group, ops/attention.expand_packed) run through the
dense XLA attention — the same oracle test_gqa.py uses."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu.ops import basic
from vitrs_tpu.ops import flash_attention_gqa as FG
from vitrs_tpu.ops.attention import expand_packed
from vitrs_tpu.ops.fused_qkv_attention import qkv_attention

D = 64


def _gqa_qkv(B, T, H, KVH, seed=0):
    """Random SMALL packed (B, T, C + 2·kvd) f32 + its padded kernel form."""
    rng = np.random.default_rng(seed)
    C, kvd = H * D, KVH * D
    small = jnp.asarray(
        rng.standard_normal((B, T, C + 2 * kvd), dtype=np.float32))
    kp = FG.kvd_padded(KVH, D)
    if kp == kvd:
        return small, small
    z = jnp.zeros((B, T, kp - kvd), jnp.float32)
    q, k, v = small[..., :C], small[..., C:C + kvd], small[..., C + kvd:]
    return small, jnp.concatenate([q, k, z, v, z], axis=-1)


def _dense_ref(small, H, KVH, causal, window=0):
    out, _ = basic.attention_dense(expand_packed(small, H, KVH), H,
                                   causal=causal, window=window)
    return out


def test_supports_gqa():
    assert FG.supports_gqa(4, 2, 64)           # one full kv block
    assert FG.supports_gqa(4, 1, 64)           # MQA, padded block
    assert FG.supports_gqa(8, 4, 64)           # two kv blocks
    assert FG.supports_gqa(12, 4, 64)          # R=3 (124M kv=4 shape)
    assert not FG.supports_gqa(4, 4, 64)       # MHA — not a GQA geometry
    assert not FG.supports_gqa(6, 3, 64)       # odd kv heads >= block
    assert not FG.supports_gqa(4, 0, 64)
    assert not FG.supports_gqa(5, 1, 64)       # C not lane-aligned
    assert not FG.supports_gqa(4, 2, 48)       # head_dim not lane-divisible


@pytest.mark.parametrize("H,KVH", [(4, 2), (4, 1), (8, 4), (8, 2)])
@pytest.mark.parametrize("causal", [False, True])
def test_fwd_single_tile_matches_dense(H, KVH, causal):
    B, T = 2, 96
    small, padded = _gqa_qkv(B, T, H, KVH, seed=H * 10 + KVH)
    sm = 1.0 / (D ** 0.5)
    out, lse = FG._fwd(padded, H, KVH, D, sm, causal, T, 512, 512,
                       interpret=True)
    want = _dense_ref(small, H, KVH, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)
    assert lse.shape == (B, H, T, 128)


@pytest.mark.parametrize("H,KVH", [(4, 2), (4, 1), (8, 4)])
@pytest.mark.parametrize("causal,window", [(False, 0), (True, 0), (True, 40)])
def test_fwd_multi_tile_matches_dense(H, KVH, causal, window):
    B, T, blk = 1, 256, 64
    small, padded = _gqa_qkv(B, T, H, KVH, seed=7)
    sm = 1.0 / (D ** 0.5)
    out, _ = FG._fwd(padded, H, KVH, D, sm, causal, T, blk, blk,
                     interpret=True, window=window)
    want = _dense_ref(small, H, KVH, causal, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("H,KVH", [(4, 2), (4, 1), (8, 4)])
@pytest.mark.parametrize("combined", [True, False])
def test_bwd_multi_tile_matches_dense_grads(H, KVH, combined, monkeypatch):
    """dq at full width, dk/dv group-summed IN KERNEL at kv width — vs
    jax.grad through the dense expansion oracle; both pair and combined
    single-pass decompositions (forced via the VMEM gate)."""
    monkeypatch.setattr(FG, "COMBINED_GQA_BUDGET",
                        1 << 30 if combined else 0)
    B, T, blk = 1, 256, 64
    C, kvd = H * D, KVH * D
    small, padded = _gqa_qkv(B, T, H, KVH, seed=3)
    sm = 1.0 / (D ** 0.5)
    out, lse = FG._fwd(padded, H, KVH, D, sm, True, T, blk, blk,
                       interpret=True)
    rng = np.random.default_rng(5)
    do = jnp.asarray(rng.standard_normal((B, T, C), dtype=np.float32))
    dq, dk, dv = FG._bwd_parts(padded, H, KVH, D, out, lse, do, sm, True, T,
                               blk, blk, interpret=True)

    def f(s):
        return jnp.vdot(_dense_ref(s, H, KVH, True), do)

    ref = jax.grad(f)(small)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(ref[..., :C]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk[..., :kvd]),
                               np.asarray(ref[..., C:C + kvd]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv[..., :kvd]),
                               np.asarray(ref[..., C + kvd:]),
                               rtol=2e-4, atol=2e-4)
    kp = FG.kvd_padded(KVH, D)
    if kp != kvd:                      # phantom kv lanes carry zero grads
        assert float(jnp.abs(dk[..., kvd:]).max()) == 0.0
        assert float(jnp.abs(dv[..., kvd:]).max()) == 0.0


@pytest.mark.parametrize("H,KVH", [(4, 2), (4, 1)])
@pytest.mark.parametrize("rope", [False, True])
def test_fused_op_native_gqa_grads_match_plain(H, KVH, rope):
    """The fused projection+attention op's native-GQA branch vs the plain
    composition (small linear -> rope -> expand -> dense attention): output
    and dln1/dqkvw/dqkvb gradients."""
    B, T = 1, 80
    C, kvd = H * D, KVH * D
    rng = np.random.default_rng(11)
    ln1 = jnp.asarray(rng.standard_normal((B, T, C), dtype=np.float32))
    qkvw = jnp.asarray(
        rng.standard_normal((C + 2 * kvd, C), dtype=np.float32) * 0.1)
    qkvb = jnp.asarray(
        rng.standard_normal(C + 2 * kvd, dtype=np.float32) * 0.1)

    assert FG.supports_gqa(H, KVH, D)

    def fused(ln1, w, b):
        return qkv_attention(ln1, w, b, H, True, True, 0, rope, KVH)

    def plain(ln1, w, b):
        small = basic.linear(ln1, w, b)
        if rope:
            from vitrs_tpu.ops.rope import rope_qk
            q, k, v = (small[..., :C], small[..., C:C + kvd],
                       small[..., C + kvd:])
            q, k = rope_qk(q, k, jnp.arange(T), H, KVH)
            small = jnp.concatenate([q, k, v], axis=-1)
        out, _ = basic.attention_dense(expand_packed(small, H, KVH), H,
                                       causal=True)
        return out

    np.testing.assert_allclose(np.asarray(fused(ln1, qkvw, qkvb)),
                               np.asarray(plain(ln1, qkvw, qkvb)),
                               rtol=3e-5, atol=3e-5)

    def loss(f):
        return lambda *a: jnp.sum(jnp.sin(f(*a)))

    g_f = jax.grad(loss(fused), argnums=(0, 1, 2))(ln1, qkvw, qkvb)
    g_p = jax.grad(loss(plain), argnums=(0, 1, 2))(ln1, qkvw, qkvb)
    for gf, gp, name in zip(g_f, g_p, ("dln1", "dqkvw", "dqkvb")):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gp),
                                   rtol=1e-3, atol=2e-4, err_msg=name)


def test_pad_gqa_weight_projection_equivalence():
    """Projecting with the padded weight == projecting small then inserting
    zero phantom lanes."""
    H, KVH = 4, 1
    C, kvd = H * D, KVH * D
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 5, C), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((C + 2 * kvd, C), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal(C + 2 * kvd, dtype=np.float32))
    wp, bp = FG.pad_gqa_weight(w, b, H, KVH, D)
    kp = FG.kvd_padded(KVH, D)
    got = basic.linear(x, wp, bp)
    small = basic.linear(x, w, b)
    assert got.shape[-1] == C + 2 * kp
    np.testing.assert_array_equal(np.asarray(got[..., :C + kvd]),
                                  np.asarray(small[..., :C + kvd]))
    np.testing.assert_array_equal(
        np.asarray(got[..., C + kp:C + kp + kvd]),
        np.asarray(small[..., C + kvd:]))
    assert float(jnp.abs(got[..., C + kvd:C + kp]).max()) == 0.0
    assert float(jnp.abs(got[..., C + kp + kvd:]).max()) == 0.0


@pytest.mark.parametrize("H,KVH,rope", [(4, 2, False), (4, 1, True)])
def test_selective_attn_branch_native_gqa(H, KVH, rope):
    """The selective-remat attention branch's NATIVE-GQA route (D=64 — the
    existing selective GQA tests use D=8 geometries that fall back):
    forward + all 7 grads vs the dense GQA oracle."""
    from vitrs_tpu.models import selective as S

    assert S._native_gqa(H, KVH, D)
    C, kvd = H * D, KVH * D
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((1, 48, C), dtype=np.float32))
    args = (
        x,
        jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.1 + 1),
        jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((C + 2 * kvd, C),
                                        dtype=np.float32) * 0.1),
        jnp.asarray(rng.standard_normal(C + 2 * kvd, dtype=np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((C, C), dtype=np.float32) * 0.1),
        jnp.asarray(rng.standard_normal(C, dtype=np.float32) * 0.1),
    )

    def f_flash(*a):
        return jnp.sum(jnp.sin(S.attn_branch(*a, H, True, True, True, KVH,
                                             rope)))

    def f_ref(*a):
        return jnp.sum(jnp.sin(S._attn_ref(*a, num_heads=H, causal=True,
                                           kv_heads=KVH, rope=rope)))

    np.testing.assert_allclose(float(f_flash(*args)), float(f_ref(*args)),
                               rtol=2e-5)
    gf = jax.grad(f_flash, argnums=tuple(range(7)))(*args)
    gr = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-4)
