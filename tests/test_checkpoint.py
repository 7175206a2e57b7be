"""Checkpoint format tests: full round-trip (fixing reference gap G8 — the
wte-only save/load stubs, train_vit.rs:715-735) with a real generated fixture
(the reference test used a placeholder path, tests/vit_tests.rs:8)."""

import os

import jax
import numpy as np
import pytest

from vitrs_tpu import checkpoint as C
from vitrs_tpu import params as P
from vitrs_tpu.config import get_config


def _rand_params(cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {k: rng.standard_normal(s, dtype=np.float32)
            for k, s in P.param_shapes(cfg).items()}


def test_header_round_trip_gpt(tmp_path):
    cfg = get_config("gpt-nano")
    params = _rand_params(cfg)
    path = str(tmp_path / "m.bin")
    C.save_checkpoint(path, params, cfg)
    p2, cfg2, extras = C.load_checkpoint(path)
    assert cfg2.max_seq_len == cfg.max_seq_len
    assert cfg2.vocab_size == cfg.vocab_size
    assert cfg2.num_layers == cfg.num_layers
    for k in P.tensor_order(cfg):
        np.testing.assert_array_equal(p2[k], params[k])


def test_header_is_1024_bytes_i32(tmp_path):
    """Header region is 1024 bytes (payload at offset 1024, train_vit.rs:141)
    read as i32[256] per llm.c — the G9 fix so vocab 50257 is representable."""
    cfg = get_config("gpt-nano").replace(vocab_size=50257)
    params = _rand_params(cfg)
    path = str(tmp_path / "m.bin")
    C.save_checkpoint(path, params, cfg)
    raw = open(path, "rb").read(1024)
    h = np.frombuffer(raw, dtype=np.int32)
    assert h[0] == C.MAGIC
    assert h[3] == 50257
    # payload starts exactly at byte 1024 with wte
    with open(path, "rb") as f:
        f.seek(1024)
        first = np.frombuffer(f.read(16), dtype=np.float32)
    np.testing.assert_array_equal(first, params["wte"].reshape(-1)[:4])


def test_payload_is_flat_canonical_order(tmp_path):
    cfg = get_config("gpt-nano")
    params = _rand_params(cfg, seed=1)
    path = str(tmp_path / "m.bin")
    C.save_checkpoint(path, params, cfg)
    n = P.num_parameters(cfg)
    with open(path, "rb") as f:
        f.seek(1024)
        flat = np.frombuffer(f.read(n * 4), dtype=np.float32)
    want = np.concatenate([params[k].reshape(-1) for k in P.tensor_order(cfg)])
    np.testing.assert_array_equal(flat, want)


def test_v2_optimizer_state_and_resume_fields(tmp_path):
    cfg = get_config("gpt-nano")
    params = _rand_params(cfg, seed=2)
    n = P.num_parameters(cfg)
    rng = np.random.default_rng(3)
    m, v = rng.standard_normal(n, dtype=np.float32), rng.random(n, dtype=np.float32)
    path = str(tmp_path / "m.bin")
    C.save_checkpoint(path, params, cfg, m=m, v=v, step=1234, seed=42, cursor=99)
    _, _, extras = C.load_checkpoint(path)
    assert extras["step"] == 1234
    assert extras["seed"] == 42
    assert extras["cursor"] == 99
    np.testing.assert_array_equal(extras["m"], m)
    np.testing.assert_array_equal(extras["v"], v)


def test_vit_mode_round_trip(tmp_path):
    cfg = get_config("vit-tiny-4-cifar10")
    params = _rand_params(cfg, seed=4)
    path = str(tmp_path / "vit.bin")
    C.save_checkpoint(path, params, cfg)
    p2, cfg2, _ = C.load_checkpoint(path)
    assert cfg2.mode == "vit"
    assert cfg2.patch_size == 4 and cfg2.num_classes == 10
    for k in P.tensor_order(cfg):
        np.testing.assert_array_equal(p2[k], params[k])


def test_bad_magic_rejected(tmp_path):
    path = str(tmp_path / "junk.bin")
    with open(path, "wb") as f:
        f.write(np.zeros(256, np.int32).tobytes())
    with pytest.raises(ValueError, match="magic"):
        C.load_checkpoint(path)


def test_truncated_payload_rejected(tmp_path):
    cfg = get_config("gpt-nano")
    params = _rand_params(cfg)
    path = str(tmp_path / "m.bin")
    C.save_checkpoint(path, params, cfg)
    full = open(path, "rb").read()
    with open(path, "wb") as f:
        f.write(full[:len(full) // 2])
    with pytest.raises(ValueError, match="truncated"):
        C.load_checkpoint(path)
