"""Token dataset/loader tests (GPT-parity training path)."""

import numpy as np

from vitrs_tpu.data import tokens as TOK


def test_synthetic_tokens_learnable_structure():
    """The Markov stream must have predictable successors (low conditional
    entropy vs uniform) so GPT smoke training has signal."""
    toks = TOK.synthetic_tokens(n=40000, vocab_size=31, seed=0)
    assert toks.dtype == np.uint16 and toks.max() < 31
    # bigram concentration: top successor should dominate
    counts = np.zeros((31, 31))
    np.add.at(counts, (toks[:-1].astype(int), toks[1:].astype(int)), 1)
    rowsum = counts.sum(1, keepdims=True).clip(1)
    top = (counts / rowsum).max(1)
    assert top.mean() > 0.2, top.mean()   # uniform would be ~1/31 = 0.032


def test_synthetic_tokens_deterministic():
    a = TOK.synthetic_tokens(n=1000, vocab_size=17, seed=3)
    b = TOK.synthetic_tokens(n=1000, vocab_size=17, seed=3)
    np.testing.assert_array_equal(a, b)


def test_loader_windows_and_targets_shifted():
    toks = np.arange(1000, dtype=np.uint16)
    loader = TOK.TokenLoader(toks, batch_size=4, seq_len=8)
    x, y = loader.next_batch()
    assert x.shape == (4, 8) and y.shape == (4, 8)
    np.testing.assert_array_equal(y, x + 1)       # shifted by one
    np.testing.assert_array_equal(x[0], np.arange(8))
    np.testing.assert_array_equal(x[1], np.arange(8, 16))


def test_loader_cursor_resume():
    toks = TOK.synthetic_tokens(n=20000, vocab_size=31, seed=1)
    l1 = TOK.TokenLoader(toks, batch_size=4, seq_len=16)
    batches = [l1.next_batch() for _ in range(6)]
    l2 = TOK.TokenLoader(toks, batch_size=4, seq_len=16, cursor=3 * 4)
    for i in range(3, 6):
        x2, y2 = l2.next_batch()
        np.testing.assert_array_equal(batches[i][0], x2)
        np.testing.assert_array_equal(batches[i][1], y2)


def test_loader_host_sharding():
    toks = np.arange(5000, dtype=np.uint16)
    full = TOK.TokenLoader(toks, batch_size=8, seq_len=4).next_batch()[0]
    parts = [TOK.TokenLoader(toks, batch_size=8, seq_len=4, host_id=h,
                             num_hosts=2).next_batch()[0] for h in range(2)]
    interleaved = np.empty_like(full)
    interleaved[0::2] = parts[0]
    interleaved[1::2] = parts[1]
    np.testing.assert_array_equal(interleaved, full)


def test_gpt_smoke_training_on_cpu():
    """GPT-mode train loop end-to-end on the CPU mesh: loss decreases."""
    import tempfile
    from vitrs_tpu.train.loop import TrainConfig, train
    with tempfile.TemporaryDirectory() as wd:
        summary = train(TrainConfig(
            preset="gpt-nano", dataset="tokens", steps=30, batch_size=16,
            lr=3e-3, warmup=5, dtype="float32", log_every=10, ckpt_every=30,
            workdir=wd, seed=0,
            model_overrides=dict(use_flash=False)))
        assert summary["eval"]["val_loss"] < 4.6   # < ln(97) = uniform