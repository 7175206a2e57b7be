"""Continuous-batching generation engine (serving_gen.py).

Greedy decode through the slot engine must reproduce `generate()` exactly
per sequence, including when sequences of different lengths share a batch,
when requests outnumber slots (admission as slots free up), and with
weight-only int8 params.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu import params as P
from vitrs_tpu.config import get_config
from vitrs_tpu.models import generate as G
from vitrs_tpu.serving_gen import GenerationEngine

CFG = get_config("gpt-nano", use_flash=False).replace(max_seq_len=64)


def _ref_greedy(params, prompt, max_new):
    out = G.generate(params, jnp.asarray(prompt)[None], CFG, max_new=max_new,
                     key=jax.random.PRNGKey(0), temperature=0.0)
    return np.asarray(out)[0]


def test_engine_matches_generate_mixed_lengths():
    params = P.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    p1 = rng.integers(0, CFG.vocab_size, 5)
    p2 = rng.integers(0, CFG.vocab_size, 9)
    eng = GenerationEngine(params, CFG, max_slots=4, max_len=32,
                           prompt_buckets=(16,))
    eng.submit(p1, max_new=6)
    eng.submit(p2, max_new=4)
    outs = dict(eng.run())
    np.testing.assert_array_equal(outs[0], _ref_greedy(params, p1, 6))
    np.testing.assert_array_equal(outs[1], _ref_greedy(params, p2, 4))


def test_engine_admission_more_requests_than_slots():
    params = P.init_params(CFG, jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, CFG.vocab_size, n) for n in (4, 7, 5)]
    eng = GenerationEngine(params, CFG, max_slots=2, max_len=32,
                           prompt_buckets=(8,))
    for p in prompts:
        eng.submit(p, max_new=3)
    outs = dict(eng.run())
    assert len(outs) == 3
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(outs[i], _ref_greedy(params, p, 3))


def test_engine_eos_frees_slot():
    params = P.init_params(CFG, jax.random.PRNGKey(2))
    rng = np.random.default_rng(2)
    p1 = rng.integers(0, CFG.vocab_size, 4)
    # find what greedy emits first, then use it as eos: run must stop at 1
    first = _ref_greedy(params, p1, 1)[-1]
    eng = GenerationEngine(params, CFG, max_slots=1, max_len=32,
                           prompt_buckets=(8,))
    eng.submit(p1, max_new=10, eos_id=int(first))
    outs = dict(eng.run())
    assert len(outs[0]) == len(p1) + 1          # stopped at eos immediately
    assert eng.free == [0]


def test_engine_int8_weight_params():
    from vitrs_tpu.ops import quant
    params = P.init_params(CFG, jax.random.PRNGKey(3))
    qp = quant.quantize_params(params, mode="gpt")
    rng = np.random.default_rng(3)
    p1 = rng.integers(0, CFG.vocab_size, 6)
    eng = GenerationEngine(qp, CFG, max_slots=2, max_len=32,
                           prompt_buckets=(8,))
    eng.submit(p1, max_new=4)
    outs = dict(eng.run())
    ref = G.generate(qp, jnp.asarray(p1)[None], CFG, max_new=4,
                     key=jax.random.PRNGKey(0), temperature=0.0)
    np.testing.assert_array_equal(outs[0], np.asarray(ref)[0])


def test_paged_engine_matches_dense_engine():
    """Paged mode (block pool + page tables) must reproduce the dense
    engine's greedy output exactly, including page reuse after retirement:
    a second wave of requests recycles the first wave's pages."""
    params = P.init_params(CFG, jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, CFG.vocab_size, n) for n in (5, 9, 4, 7)]
    # pool sized for only ~2 concurrent requests -> forces recycling
    eng = GenerationEngine(params, CFG, max_slots=2, max_len=32,
                           prompt_buckets=(16,), paged=True, n_pages=5)
    for p in prompts:
        eng.submit(p, max_new=4)
    outs = dict(eng.run())
    assert len(outs) == 4
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(outs[i], _ref_greedy(params, p, 4))
    # all non-sink pages returned to the pool
    assert sorted(eng.free_pages) == [1, 2, 3, 4]


def test_paged_pool_smaller_than_dense():
    """The point of paging: serve max_slots=4 requests from a pool smaller
    than 4 * max_len tokens (here 3 pages < 4 slots x 2 pages)."""
    params = P.init_params(CFG, jax.random.PRNGKey(5))
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, CFG.vocab_size, 6) for _ in range(4)]
    eng = GenerationEngine(params, CFG, max_slots=4, max_len=32,
                           prompt_buckets=(16,), paged=True, n_pages=4)
    for p in prompts:
        eng.submit(p, max_new=3)
    outs = dict(eng.run())          # admission waits for pages, still finishes
    assert len(outs) == 4
    for i, p in enumerate(prompts):
        np.testing.assert_array_equal(outs[i], _ref_greedy(params, p, 3))


def test_chunked_decode_matches_per_tick_greedy():
    """decode_chunk=4 (N on-device ticks + on-device sampling per sync)
    must reproduce the per-tick engine greedily, dense AND paged, including
    mid-chunk retirement (different max_new per request)."""
    params = P.init_params(CFG, jax.random.PRNGKey(6))
    rng = np.random.default_rng(6)
    prompts = [rng.integers(0, CFG.vocab_size, n) for n in (5, 9, 4)]
    news = [6, 3, 7]
    for paged in (False, True):
        eng = GenerationEngine(params, CFG, max_slots=2, max_len=32,
                               prompt_buckets=(16,), paged=paged,
                               decode_chunk=4)
        for p, mn in zip(prompts, news):
            eng.submit(p, max_new=mn)
        outs = dict(eng.run())
        for i, (p, mn) in enumerate(zip(prompts, news)):
            np.testing.assert_array_equal(outs[i], _ref_greedy(params, p, mn),
                                          err_msg=f"paged={paged} req={i}")


def test_chunked_sampled_smoke():
    params = P.init_params(CFG, jax.random.PRNGKey(7))
    rng = np.random.default_rng(7)
    eng = GenerationEngine(params, CFG, max_slots=2, max_len=32,
                           prompt_buckets=(8,), decode_chunk=3, top_k=5)
    eng.submit(rng.integers(0, CFG.vocab_size, 6), max_new=5, temperature=0.9)
    outs = dict(eng.run())
    assert len(outs[0]) == 11
    assert (np.asarray(outs[0]) < CFG.vocab_size).all()


def test_text_engine_end_to_end():
    """Text in, text out: tokenizer -> engine -> detokenizer; greedy output
    must equal the raw-id reference path on the same encoded prompt."""
    from vitrs_tpu.data.tokenizer import ByteBPETokenizer
    from vitrs_tpu.serving_gen import TextEngine

    corpus = "the quick brown fox jumps over the lazy dog " * 20
    tok = ByteBPETokenizer.train(corpus, vocab_size=280)
    cfg = CFG.replace(vocab_size=tok.vocab_size)
    params = P.init_params(cfg, jax.random.PRNGKey(3))
    te = TextEngine(params, cfg, tok, max_slots=2, max_len=32,
                    prompt_buckets=(16,))
    prompts = ["the quick", "lazy dog"]
    outs = te.generate(prompts, max_new=5)
    assert len(outs) == 2
    for text, out in zip(prompts, outs):
        ids = tok.encode(text)
        ref = G.generate(params, jnp.asarray(ids)[None], cfg, max_new=5,
                         key=jax.random.PRNGKey(0), temperature=0.0)
        ref_gen = [int(t) for t in np.asarray(ref)[0][len(ids):]]
        if tok.eot_id in ref_gen:
            ref_gen = ref_gen[:ref_gen.index(tok.eot_id)]
        assert out == tok.decode(ref_gen)
    # echo mode prefixes the original prompt text verbatim
    outs_echo = te.generate(["the quick"], max_new=3, echo_prompt=True)
    assert outs_echo[0].startswith("the quick")


def test_engine_tiny_max_len_gets_fallback_bucket():
    """max_len below every default prompt bucket (32/64/128) must still
    serve: the engine falls back to a single max_len-sized bucket instead
    of an empty bucket list (vitrs-generate with gpt-nano hit max() on an
    empty sequence here)."""
    params = P.init_params(CFG, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    p1 = rng.integers(0, CFG.vocab_size, 5)
    eng = GenerationEngine(params, CFG, max_slots=2, max_len=16)
    assert eng.buckets == (16,)
    eng.submit(p1, max_new=4)
    outs = dict(eng.run())
    np.testing.assert_array_equal(outs[0], _ref_greedy(params, p1, 4))
