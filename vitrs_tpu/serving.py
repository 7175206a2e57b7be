"""Serving/export: ahead-of-time model serialization via jax.export.

A production deployment path the reference has no analogue for (its inference
story is 'forward without targets', SURVEY.md §3.5): serialize the jitted
forward — StableHLO + embedded weights or weightless — to a single artifact
that a serving process deserializes and calls without Python model code.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Dict

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .config import ViTConfig
from .models import model as M

_MAGIC = b"VITRSRV1"


def export_forward(params: Dict, cfg: ViTConfig, batch_size: int,
                   path: str) -> None:
    """Serialize the classification/logits forward for fixed batch geometry.
    Weights are captured as constants inside the artifact."""
    if cfg.mode == "vit":
        example = jnp.zeros((batch_size, cfg.img_size, cfg.img_size,
                             cfg.in_chans), jnp.float32)

        def fwd(x):
            return M.vit_forward(params, x, cfg, train=False)
    else:
        example = jnp.zeros((batch_size, cfg.max_seq_len), jnp.int32)

        def fwd(x):
            return M.gpt_forward(params, x, cfg)

    exp = jax_export.export(jax.jit(fwd))(example)
    blob = bytes(exp.serialize())
    meta = {"mode": cfg.mode, "batch_size": batch_size,
            "input_shape": list(example.shape),
            "input_dtype": str(example.dtype)}
    # plain length-prefixed JSON + StableHLO bytes — NOT pickle, which would
    # execute arbitrary code when loading an untrusted artifact
    mjson = json.dumps(meta).encode()
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<II", len(mjson), len(blob)))
        f.write(mjson)
        f.write(blob)
    os.replace(tmp, path)


class ServedModel:
    """Deserialized artifact: call with a batch, get logits. No model code,
    no config, no params needed at serving time."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            if f.read(len(_MAGIC)) != _MAGIC:
                raise ValueError(f"not a vitrs serving artifact: {path}")
            mlen, blen = struct.unpack("<II", f.read(8))
            self.meta = json.loads(f.read(mlen).decode())
            blob = f.read(blen)
        if len(blob) != blen:
            raise ValueError(f"truncated serving artifact: {path}")
        self._exported = jax_export.deserialize(bytearray(blob))
        self._call = jax.jit(self._exported.call)

    def __call__(self, x) -> jax.Array:
        x = jnp.asarray(x, dtype=self.meta["input_dtype"])
        assert x.shape == tuple(self.meta["input_shape"]), (
            f"expected {self.meta['input_shape']}, got {x.shape}")
        return self._call(x)
