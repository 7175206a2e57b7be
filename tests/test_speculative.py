"""Speculative decoding (models/speculative.py): greedy output must be
bitwise identical to target-only decoding; acceptance accounting sane."""

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu import params as P
from vitrs_tpu.config import get_config
from vitrs_tpu.models import generate as G
from vitrs_tpu.models import speculative as SP

TGT_CFG = get_config("gpt-nano", use_flash=False).replace(max_seq_len=64)
DRAFT_CFG = TGT_CFG.replace(num_layers=1, channels=8, num_heads=1)


def _models(seed=0):
    tgt = P.init_params(TGT_CFG, jax.random.PRNGKey(seed))
    draft = P.init_params(DRAFT_CFG, jax.random.PRNGKey(seed + 1))
    rng = np.random.default_rng(seed)
    prompt = jnp.asarray(rng.integers(0, TGT_CFG.vocab_size, (1, 5)))
    return tgt, draft, prompt


def test_greedy_spec_decode_matches_target_exactly():
    """The whole point: any draft, bitwise-target-greedy output."""
    tgt, draft, prompt = _models(0)
    want = np.asarray(G.generate(tgt, prompt, TGT_CFG, max_new=16,
                                 key=jax.random.PRNGKey(0), temperature=0.0))
    for K in (1, 3, 4):
        out, stats = SP.generate_speculative(
            tgt, draft, prompt, TGT_CFG, DRAFT_CFG, max_new=16, K=K,
            key=jax.random.PRNGKey(0), temperature=0.0)
        np.testing.assert_array_equal(np.asarray(out), want, err_msg=f"K={K}")
        assert int(stats["drafted"]) == K * int(stats["target_calls"])
        assert 0 <= int(stats["accepted"]) <= int(stats["drafted"])


def test_self_draft_accepts_everything_greedy():
    """draft == target (greedy): every proposal agrees, so each target call
    emits K+1 tokens — the ceiling of the method."""
    tgt, _, prompt = _models(1)
    K = 4
    out, stats = SP.generate_speculative(
        tgt, tgt, prompt, TGT_CFG, TGT_CFG, max_new=16, K=K,
        key=jax.random.PRNGKey(0), temperature=0.0)
    assert int(stats["accepted"]) == int(stats["drafted"])
    # ceil(16 / (K+1)) target calls
    assert int(stats["target_calls"]) == -(-16 // (K + 1))
    want = np.asarray(G.generate(tgt, prompt, TGT_CFG, max_new=16,
                                 key=jax.random.PRNGKey(0), temperature=0.0))
    np.testing.assert_array_equal(np.asarray(out), want)


def test_sampled_spec_decode_valid_and_self_draft_accepts():
    """Sampled mode: tokens in-vocab; with draft == target the acceptance
    test u < p/q = 1 always passes."""
    tgt, draft, prompt = _models(2)
    out, stats = SP.generate_speculative(
        tgt, draft, prompt, TGT_CFG, DRAFT_CFG, max_new=12, K=3,
        key=jax.random.PRNGKey(3), temperature=0.9, top_k=11)
    arr = np.asarray(out)
    assert arr.shape == (1, 17)
    assert (0 <= arr).all() and (arr < TGT_CFG.vocab_size).all()
    out2, stats2 = SP.generate_speculative(
        tgt, tgt, prompt, TGT_CFG, TGT_CFG, max_new=12, K=3,
        key=jax.random.PRNGKey(3), temperature=0.9, top_k=11)
    assert int(stats2["accepted"]) == int(stats2["drafted"])
