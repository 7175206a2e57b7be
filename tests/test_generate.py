"""KV-cache decode tests: cache path must agree exactly with the full
forward, and generation must be shape-correct and deterministic at temp 0."""

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu import params as P
from vitrs_tpu.config import get_config
from vitrs_tpu.models import generate as G
from vitrs_tpu.models import model as M

CFG = get_config("gpt-nano", use_flash=False)


def _setup(seed=0):
    params = P.init_params(CFG, jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 5)))
    return params, prompt


def test_prefill_logits_match_full_forward():
    params, prompt = _setup()
    caches = G.init_kv_cache(CFG, 2, 12)
    logits_cache, _ = G.forward_with_cache(params, prompt, caches, 0, CFG)
    logits_full = M.gpt_forward(params, prompt, CFG)
    np.testing.assert_allclose(np.asarray(logits_cache),
                               np.asarray(logits_full), rtol=2e-4, atol=1e-4)


def test_incremental_decode_matches_full_forward():
    """Feeding tokens one at a time through the cache must reproduce the
    full-sequence forward logits at every position."""
    params, prompt = _setup(1)
    B, T = prompt.shape
    caches = G.init_kv_cache(CFG, B, T)
    step_logits = []
    for t in range(T):
        lg, caches = G.forward_with_cache(params, prompt[:, t:t + 1], caches,
                                          t, CFG)
        step_logits.append(np.asarray(lg[:, 0]))
    full = np.asarray(M.gpt_forward(params, prompt, CFG))
    got = np.stack(step_logits, axis=1)
    np.testing.assert_allclose(got, full, rtol=3e-4, atol=2e-4)


def test_greedy_generation_deterministic_and_in_range():
    params, prompt = _setup(2)
    out1 = G.generate(params, prompt, CFG, max_new=6, key=jax.random.PRNGKey(0),
                      temperature=0.0)
    out2 = G.generate(params, prompt, CFG, max_new=6, key=jax.random.PRNGKey(9),
                      temperature=0.0)
    assert out1.shape == (2, 11)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    np.testing.assert_array_equal(np.asarray(out1[:, :5]), np.asarray(prompt))
    assert np.asarray(out1).max() < CFG.vocab_size


def test_greedy_matches_full_recompute():
    """Greedy decode with cache == greedy decode recomputing the full prefix
    each step through the ordinary forward."""
    params, prompt = _setup(3)
    max_new = 4
    out = np.asarray(G.generate(params, prompt, CFG, max_new=max_new,
                                key=jax.random.PRNGKey(0), temperature=0.0))
    seq = np.asarray(prompt)
    for _ in range(max_new):
        logits = np.asarray(M.gpt_forward(params, jnp.asarray(seq), CFG))
        nxt = logits[:, -1].argmax(-1)
        seq = np.concatenate([seq, nxt[:, None]], axis=1)
    np.testing.assert_array_equal(out, seq)


def test_sampled_generation_respects_top_k():
    params, prompt = _setup(4)
    out = G.generate(params, prompt, CFG, max_new=8, key=jax.random.PRNGKey(1),
                     temperature=1.0, top_k=3)
    assert out.shape == (2, 13)
    assert np.asarray(out).max() < CFG.vocab_size


def test_max_new_1():
    params, prompt = _setup(5)
    out = G.generate(params, prompt, CFG, max_new=1, key=jax.random.PRNGKey(0),
                     temperature=0.0)
    assert out.shape == (2, 6)


def test_int8_weight_only_generation_tracks_float():
    """generate() with ops/quant weight-only params: greedy output must be
    valid and the cached-forward logits must track the float model within
    the int8 rounding budget."""
    from vitrs_tpu.ops import quant
    params, prompt = _setup(3)
    qp = quant.quantize_params(params, mode="gpt")
    caches_f = G.init_kv_cache(CFG, 2, 5)
    caches_q = G.init_kv_cache(CFG, 2, 5)
    lf, _ = G.forward_with_cache(params, prompt, caches_f, 0, CFG)
    lq, _ = G.forward_with_cache(qp, prompt, caches_q, 0, CFG)
    rel = np.abs(np.asarray(lq) - np.asarray(lf)).mean() / (
        np.abs(np.asarray(lf)).mean() + 1e-9)
    assert rel < 0.05, rel
    out = G.generate(qp, prompt, CFG, max_new=4,
                     key=jax.random.PRNGKey(0), temperature=0.0)
    assert out.shape == (2, 9)
    assert (np.asarray(out) >= 0).all()
    assert (np.asarray(out) < CFG.vocab_size).all()


def test_top_p_filter_keeps_nucleus_only():
    """_filter_logits(top_p): keeps exactly the smallest descending-prob
    prefix reaching mass p; the argmax always survives."""
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    kept = G._filter_logits(logits, 0, 0.75)
    # cum-exclusive: 0 (keep), 0.5 (keep), 0.8 (drop), 0.95 (drop)
    assert np.isfinite(np.asarray(kept)[0, :2]).all()
    assert np.isneginf(np.asarray(kept)[0, 2:]).all()
    # extreme p -> only the argmax survives
    kept1 = np.asarray(G._filter_logits(logits, 0, 1e-6))
    assert np.isfinite(kept1[0, 0]) and np.isneginf(kept1[0, 1:]).all()
    # p=1.0 and p=0 (off) are no-ops
    for p in (0.0, 1.0):
        np.testing.assert_array_equal(np.asarray(
            G._filter_logits(logits, 0, p)), np.asarray(logits))


def test_sampled_generation_top_p_stays_in_nucleus():
    """With a tiny top_p every sampled token must equal greedy."""
    params, prompt = _setup(6)
    greedy = np.asarray(G.generate(params, prompt, CFG, max_new=6,
                                   key=jax.random.PRNGKey(2),
                                   temperature=0.0))
    nucleus = np.asarray(G.generate(params, prompt, CFG, max_new=6,
                                    key=jax.random.PRNGKey(3),
                                    temperature=1.0, top_p=1e-9))
    np.testing.assert_array_equal(nucleus, greedy)


def test_engine_per_request_top_p_tick_mode():
    from vitrs_tpu.serving_gen import GenerationEngine
    params, prompt = _setup(7)
    eng = GenerationEngine(params, CFG, max_slots=2,
                           max_len=CFG.max_seq_len,
                           prompt_buckets=(CFG.max_seq_len // 2,))
    eng.submit(np.asarray(prompt)[0], max_new=5, temperature=1.0,
               top_p=1e-9)
    outs = dict(eng.run())
    want = np.asarray(G.generate(params, np.asarray(prompt)[:1], CFG,
                                 max_new=5, key=jax.random.PRNGKey(0),
                                 temperature=0.0))[0]
    np.testing.assert_array_equal(outs[0], want)


def test_beam_1_equals_greedy():
    params, prompt = _setup(7)
    greedy = G.generate(params, prompt, CFG, max_new=6,
                        key=jax.random.PRNGKey(0), temperature=0.0)
    beam1 = G.generate_beam(params, prompt, CFG, max_new=6, beams=1)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(beam1))


def test_beam_search_finds_higher_logprob_than_greedy():
    """Beam search's whole point: the returned sequence's cumulative
    log-prob is >= greedy's (strictly > on sequences where greedy's myopic
    first pick forecloses a better continuation — with random weights some
    example in the batch virtually always exhibits this)."""
    params, _ = _setup(8)
    rng = np.random.default_rng(8)
    prompt = jnp.asarray(rng.integers(0, CFG.vocab_size, (6, 4)))
    N = 6

    def seq_logprob(seq):
        lg = M.gpt_forward(params, seq[:, :-1], CFG)
        lp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        tgt = seq[:, 1:]
        tok_lp = jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        return np.asarray(tok_lp[:, -N:].sum(-1))     # generated part only

    greedy = G.generate(params, prompt, CFG, max_new=N,
                        key=jax.random.PRNGKey(0), temperature=0.0)
    beam = G.generate_beam(params, prompt, CFG, max_new=N, beams=4)
    lp_g, lp_b = seq_logprob(greedy), seq_logprob(beam)
    assert np.all(lp_b >= lp_g - 1e-4), (lp_b, lp_g)
    assert np.any(lp_b > lp_g + 1e-5), "beam never beat greedy (suspicious)"


def test_beam_search_gqa_rope_window_smoke():
    cfg = get_config("gpt-nano", use_flash=False, num_heads=4, channels=32,
                     num_kv_heads=2, pos_emb="rope", window=5)
    params = P.init_params(cfg, jax.random.PRNGKey(9))
    rng = np.random.default_rng(9)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 4)))
    out = G.generate_beam(params, prompt, cfg, max_new=5, beams=3)
    assert out.shape == (2, 9)
    assert np.asarray(out).max() < cfg.vocab_size


def test_chunked_prefill_matches_whole_prefill():
    """generate(prefill_chunk=N) == generate() exactly: the chunked prefill
    (long-prompt memory fix — a whole-prompt prefill materializes
    (B, T0, V) logits) seeds the same first token and cache state."""
    import numpy as np
    cfg = get_config("gpt-nano", use_flash=False, max_seq_len=64).replace(
        num_layers=2, channels=16, num_heads=2)
    p = P.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 32)))
    a = G.generate(p, prompt, cfg, 8, jax.random.PRNGKey(1), temperature=0.0)
    b = G.generate(p, prompt, cfg, 8, jax.random.PRNGKey(1), temperature=0.0,
                   prefill_chunk=8)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
