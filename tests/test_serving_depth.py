"""Serving depth (VERDICT r1 next #9): int8 KV cache parity + the
micro-batching inference loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.models import generate as G
from vitrs_tpu.models import model as M

CFG = get_config("gpt-nano", use_flash=False).replace(
    max_seq_len=48, vocab_size=97, num_layers=2, num_heads=2, channels=32,
    dtype="float32")


def _params(seed=0):
    return PRM.init_params(CFG, jax.random.PRNGKey(seed), scheme="production")


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 32), dtype=np.float32) * 3)
    q, s = G.quantize_kv(x, 2)
    assert q.dtype == jnp.int8 and q.shape == (2, 5, 2, 16)
    back = G._dequant(q, s, jnp.float32).transpose(0, 2, 1, 3).reshape(2, 5, 32)
    # absmax symmetric int8: error <= scale/127 per element
    bound = np.repeat(np.asarray(s)[..., 0], 16, axis=-1).reshape(2, 5, 32)
    assert (np.abs(np.asarray(back - x)) <= bound / 127 + 1e-6).all()


def test_int8_kv_generation_matches_fp_greedy():
    """Greedy decode with the int8 cache must track the fp cache: logits
    differ at ~1e-2, argmax sequences should agree on a well-separated
    model (random-init logits are diffuse, so compare logits not tokens)."""
    params = _params()
    prompt = jnp.asarray(np.random.default_rng(1).integers(0, 97, (2, 8)),
                         jnp.int32)
    caches_fp = G.init_kv_cache(CFG, 2, 16)
    caches_q = G.init_kv_cache(CFG, 2, 16, int8=True)
    lg_fp, _ = G.forward_with_cache(params, prompt, caches_fp, 0, CFG)
    lg_q, _ = G.forward_with_cache(params, prompt, caches_q, 0, CFG)
    np.testing.assert_allclose(np.asarray(lg_q), np.asarray(lg_fp),
                               atol=0.05, rtol=0.05)


def test_int8_generate_end_to_end():
    params = _params()
    prompt = jnp.asarray(np.random.default_rng(2).integers(0, 97, (2, 6)),
                         jnp.int32)
    out_fp = G.generate(params, prompt, CFG, max_new=10,
                        key=jax.random.PRNGKey(0), temperature=0.0)
    out_q = G.generate(params, prompt, CFG, max_new=10,
                       key=jax.random.PRNGKey(0), temperature=0.0,
                       kv_int8=True)
    assert out_q.shape == (2, 16)
    np.testing.assert_array_equal(np.asarray(out_q[:, :6]),
                                  np.asarray(prompt))
    # greedy sequences from fp and int8 caches agree on most steps
    agree = (np.asarray(out_fp[:, 6:]) == np.asarray(out_q[:, 6:])).mean()
    assert agree >= 0.7, agree


def test_int8_cache_halves_cache_bytes():
    fp_k, _ = G.init_kv_cache(CFG, 4, 32)
    (qk, qs), _ = G.init_kv_cache(CFG, 4, 32, int8=True)
    fp_bytes = fp_k.size * fp_k.dtype.itemsize
    q_bytes = qk.size * qk.dtype.itemsize + qs.size * qs.dtype.itemsize
    assert q_bytes < fp_bytes * 0.6          # int8 + per-head scales


def test_batching_server_coalesces_and_scatters():
    from vitrs_tpu.serving import BatchingServer
    calls = []

    @jax.jit
    def fwd(x):
        return x * 2.0 + 1.0

    def fn(x):
        calls.append(len(x))
        return fwd(x)

    srv = BatchingServer(fn, batch_size=4, max_wait_ms=50.0)
    try:
        futs = [srv.submit(np.full((3,), i, np.float32)) for i in range(6)]
        outs = [f.result(timeout=10) for f in futs]
        for i, o in enumerate(outs):
            np.testing.assert_allclose(o, np.full((3,), 2.0 * i + 1.0))
        # all device calls ran at the compiled batch size
        assert all(c == 4 for c in calls)
    finally:
        srv.close()


def test_batching_server_serves_classifier():
    from vitrs_tpu.serving import BatchingServer
    cfg = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
        num_layers=2, channels=32, num_heads=2)
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))
    fwd = jax.jit(lambda x: M.vit_forward(params, x, cfg, train=False))
    srv = BatchingServer(fwd, batch_size=8, max_wait_ms=20.0)
    try:
        rng = np.random.default_rng(0)
        xs = rng.standard_normal((5, 32, 32, 3), dtype=np.float32)
        futs = [srv.submit(x) for x in xs]
        got = np.stack([f.result(timeout=30) for f in futs])
        want = np.asarray(fwd(jnp.asarray(
            np.concatenate([xs, xs[:3]]))))[:5]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    finally:
        srv.close()


def test_batching_server_propagates_errors():
    from vitrs_tpu.serving import BatchingServer

    def bad(x):
        raise RuntimeError("boom")

    srv = BatchingServer(bad, batch_size=2, max_wait_ms=1.0)
    try:
        fut = srv.submit(np.zeros(3, np.float32))
        with pytest.raises(RuntimeError, match="boom"):
            fut.result(timeout=10)
    finally:
        srv.close()
