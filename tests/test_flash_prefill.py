"""Rectangular continuation-prefill flash kernel vs the dense cache form —
interpret mode on CPU (the test_flash_attention.py convention), plus the
integrated chunked-generate parity at a kernel-tileable geometry.

The reference has no incremental decode at all (SURVEY.md §3.5); the dense
ground truth here is the same grouped cache attention the serving path used
before the kernel existed (models/generate._cache_attention semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitrs_tpu import params as P
from vitrs_tpu.config import get_config
from vitrs_tpu.models import generate as G
from vitrs_tpu.ops.flash_prefill import flash_prefill_qkv, supports_prefill


def _dense_rect(q, k, v, num_heads, kv_heads, q_off, window=0):
    """Dense rectangular reference: query i (absolute q_off+i) attends keys
    j <= q_off+i (and j > q_off+i-window)."""
    B, S, C = q.shape
    Tk = k.shape[1]
    D = C // num_heads
    qh = q.reshape(B, S, num_heads, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Tk, kv_heads, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Tk, kv_heads, D).transpose(0, 2, 1, 3)
    row = q_off + jnp.arange(S)[:, None]
    col = jnp.arange(Tk)[None, :]
    mask = col <= row
    if window:
        mask = jnp.logical_and(mask, col > row - window)
    out = G._cache_attention(qh, kh, vh, mask[None], q.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, S, C)


@pytest.mark.parametrize("nh,kh", [(4, 4), (4, 2)])
@pytest.mark.parametrize("s,q_off", [(64, 0), (128, 128), (200, 133)])
def test_rect_kernel_vs_dense(nh, kh, s, q_off):
    D, Tk = 64, 512
    assert supports_prefill(nh, kh, D)
    rng = np.random.default_rng(nh * 1000 + s + q_off)
    B, C, kvd = 2, nh * D, kh * D
    q = jnp.asarray(rng.standard_normal((B, s, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Tk, kvd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Tk, kvd)), jnp.float32)
    # poison the unfilled tail: the kernel must never read past the frontier
    poison = jnp.full((B, Tk - (q_off + s), kvd), 1e9, jnp.float32)
    k = k.at[:, q_off + s:].set(poison)
    v = v.at[:, q_off + s:].set(poison)
    got = flash_prefill_qkv(q, k, v, nh, kh, q_off, interpret=True)
    want = _dense_rect(q, k.at[:, q_off + s:].set(0.0),
                       v.at[:, q_off + s:].set(0.0), nh, kh, q_off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_rect_kernel_windowed():
    nh, kh, D, Tk, s, q_off, W = 4, 2, 64, 512, 128, 256, 96
    rng = np.random.default_rng(7)
    B, C, kvd = 2, nh * D, kh * D
    q = jnp.asarray(rng.standard_normal((B, s, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Tk, kvd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Tk, kvd)), jnp.float32)
    got = flash_prefill_qkv(q, k, v, nh, kh, q_off, window=W, interpret=True)
    want = _dense_rect(q, k, v, nh, kh, q_off, window=W)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def _gen_cfg(**kw):
    return get_config("gpt-nano", use_flash=False, max_seq_len=512,
                      channels=256, num_heads=4, **kw)


@pytest.mark.parametrize("kw", [dict(), dict(num_kv_heads=2, pos_emb="rope"),
                                dict(window=96)])
def test_chunked_generate_flash_cont_matches_whole(monkeypatch, kw):
    """generate(prefill_chunk) with the rectangular kernel forced on
    (interpret mode) == the whole-prompt dense prefill, at a geometry the
    kernel actually tiles (D=64) — the integrated continuation path."""
    monkeypatch.setattr(G, "_FLASH_CONT_INTERPRET", True)
    cfg = _gen_cfg(**kw).replace(num_layers=2, use_flash=True)
    p = P.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 256)))
    whole = G.generate(p, prompt, cfg, 8, jax.random.PRNGKey(1),
                       temperature=0.0)
    chunked = G.generate(p, prompt, cfg, 8, jax.random.PRNGKey(1),
                         temperature=0.0, prefill_chunk=128)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(chunked))


def test_chunked_logits_flash_cont_close(monkeypatch):
    """Continuation-chunk logits through the rectangular kernel vs the dense
    cache path (flash forced OFF) — numerical parity of the two forms."""
    cfg = _gen_cfg().replace(num_layers=2)
    p = P.init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 256)))

    def run(flash):
        monkeypatch.setattr(G, "_FLASH_CONT_INTERPRET", flash)
        c = cfg.replace(use_flash=flash)
        caches = G.init_kv_cache(c, 2, 512)
        _, caches = G.forward_with_cache(p, prompt[:, :128], caches, 0, c)
        lg, _ = G.forward_with_cache(p, prompt[:, 128:], caches, 128, c)
        return np.asarray(lg)

    np.testing.assert_allclose(run(True), run(False), rtol=2e-4, atol=2e-4)


def test_chunked_generate_int8_cache(monkeypatch):
    """int8 KV cache continuation chunks ride the kernel too (dequantized
    flat history): chunked == whole under the same int8 mode."""
    monkeypatch.setattr(G, "_FLASH_CONT_INTERPRET", True)
    cfg = _gen_cfg().replace(num_layers=2, use_flash=True)
    p = P.init_params(cfg, jax.random.PRNGKey(5))
    rng = np.random.default_rng(5)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 256)))
    whole = G.generate(p, prompt, cfg, 8, jax.random.PRNGKey(1),
                       temperature=0.0, kv_int8=True)
    chunked = G.generate(p, prompt, cfg, 8, jax.random.PRNGKey(1),
                         temperature=0.0, kv_int8=True, prefill_chunk=128)
    np.testing.assert_array_equal(np.asarray(whole), np.asarray(chunked))


def test_unaligned_cache_falls_back_dense(monkeypatch):
    """A supported geometry with a NON-tile-aligned cache length (possible
    only through direct forward_with_cache use — generate() rounds the
    allocation) must fall back to the dense cache form, not assert."""
    monkeypatch.setattr(G, "_FLASH_CONT_INTERPRET", True)
    cfg = _gen_cfg().replace(num_layers=2, use_flash=True)
    p = P.init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 256)))
    assert not G._flash_cont_ok(cfg, 500)
    caches = G.init_kv_cache(cfg, 2, 500)
    _, caches = G.forward_with_cache(p, prompt[:, :128], caches, 0, cfg)
    lg_unaligned, _ = G.forward_with_cache(p, prompt[:, 128:], caches, 128,
                                           cfg)
    caches2 = G.init_kv_cache(cfg, 2, 512)
    _, caches2 = G.forward_with_cache(p, prompt[:, :128], caches2, 0, cfg)
    lg_flash, _ = G.forward_with_cache(p, prompt[:, 128:], caches2, 128, cfg)
    np.testing.assert_allclose(np.asarray(lg_unaligned), np.asarray(lg_flash),
                               rtol=2e-4, atol=2e-4)
