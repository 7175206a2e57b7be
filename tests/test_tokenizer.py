"""Byte-level BPE tokenizer (vitrs_tpu/data/tokenizer.py) — lossless
round-trip, deterministic training, persistence, GPT-2 merges format.

The reference consumes raw ids (rusty_vit.rs:73); the tokenizer is the text
front-end VERDICT r2 (missing #4) asked for."""

import numpy as np
import pytest

from vitrs_tpu.data.tokenizer import ByteBPETokenizer, _B2U, _U2B

CORPUS = (
    "The quick brown fox jumps over the lazy dog. "
    "the the the them there then quickly quick quicker "
    "low lower lowest newer newest wider widest "
    "Transformers tokenize text into subword units; byte-level BPE "
    "guarantees coverage of any input, even éèê or 中文 or emoji \U0001f680.\n" * 8)


def test_byte_unicode_bijection():
    assert len(_B2U) == 256
    assert len(_U2B) == 256
    for b, u in _B2U.items():
        assert _U2B[u] == b


def test_byte_fallback_roundtrip():
    """No merges at all: vocab = 256 + specials, still lossless."""
    tok = ByteBPETokenizer()
    assert tok.vocab_size == 257
    for text in ("hello world", "café 中文 \U0001f680",
                 "tabs\tand\nnewlines\x00ctrl", ""):
        ids = tok.encode(text)
        assert tok.decode(ids) == text
        assert all(0 <= i < 256 for i in ids)


def test_trained_roundtrip_and_compression():
    tok = ByteBPETokenizer.train(CORPUS, vocab_size=512)
    assert tok.vocab_size <= 512
    ids = tok.encode(CORPUS)
    assert tok.decode(ids) == CORPUS
    n_bytes = len(CORPUS.encode("utf-8"))
    # merges must actually compress the training distribution
    assert len(ids) < 0.7 * n_bytes, (len(ids), n_bytes)
    # and arbitrary unseen text still round-trips (byte coverage)
    other = "Zebra! ümläuts & русский 12345 :-)"
    assert tok.decode(tok.encode(other)) == other


def test_training_deterministic():
    t1 = ByteBPETokenizer.train(CORPUS, vocab_size=400)
    t2 = ByteBPETokenizer.train(CORPUS, vocab_size=400)
    assert t1.merges == t2.merges
    assert t1.encode(CORPUS) == t2.encode(CORPUS)


def test_specials_single_id():
    tok = ByteBPETokenizer.train(CORPUS, vocab_size=300)
    eot = tok.eot_id
    assert eot == tok.vocab_size - 1
    ids = tok.encode("hello<|endoftext|>world")
    assert ids.count(eot) == 1
    assert tok.decode(ids) == "hello<|endoftext|>world"
    # encode_ordinary treats the special string as plain text
    assert eot not in tok.encode_ordinary("hello<|endoftext|>world")


def test_save_load_roundtrip(tmp_path):
    tok = ByteBPETokenizer.train(CORPUS, vocab_size=384)
    path = str(tmp_path / "tok.json")
    tok.save(path)
    tok2 = ByteBPETokenizer.load(path)
    assert tok2.merges == tok.merges
    assert tok2.vocab_size == tok.vocab_size
    s = "quickly the newest café"
    assert tok2.encode(s) == tok.encode(s)


def test_gpt2_merges_file_format(tmp_path):
    """OpenAI merges.txt format loads into the identical tokenizer."""
    tok = ByteBPETokenizer.train(CORPUS, vocab_size=320)
    path = str(tmp_path / "merges.txt")
    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in tok.merges:
            f.write(f"{a} {b}\n")
    tok2 = ByteBPETokenizer.from_gpt2_files(path)
    assert tok2.merges == tok.merges
    s = "the quick brown fox"
    assert tok2.encode(s) == tok.encode(s)


def test_presplit_blocks_cross_space_merges():
    """Merges never span a pre-split boundary: encoding 'ab cd' is the
    concatenation of encoding 'ab' and ' cd' (GPT-2's locality property —
    enables windowed/streaming encoding)."""
    tok = ByteBPETokenizer.train(CORPUS, vocab_size=512)
    assert tok.encode("the quick") == tok.encode("the") + tok.encode_ordinary(
        " quick")


def test_ids_feed_the_model():
    """Tokenizer output is directly consumable by the gpt path."""
    import jax
    import jax.numpy as jnp
    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    from vitrs_tpu.models import model as M

    tok = ByteBPETokenizer.train(CORPUS, vocab_size=300)
    cfg = get_config("gpt-nano", use_flash=False).replace(
        vocab_size=tok.vocab_size)
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))
    ids = tok.encode("the quick brown fox")[:cfg.max_seq_len]
    x = jnp.asarray(np.asarray(ids)[None, :])
    logits = M.gpt_forward(params, x, cfg)
    assert logits.shape == (1, len(ids), tok.vocab_size)


def test_presplit_is_lossless_on_word_chars():
    """The pre-split must cover the FULL complement {letter, digit, other,
    space}: the naive [^\\s\\w] 'other' class silently dropped '_' (and any
    word char that is neither letter nor digit) — code review r3 finding;
    this repo's own source is underscore-heavy."""
    t = ByteBPETokenizer()
    for s in ("snake_case foo _bar_", "a__b", "x² + ½",
              "def pp_param_specs(cfg):", "mix_17 ⅡⅢ"):
        assert t.decode(t.encode(s)) == s, s
