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
import numpy as np
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


class BatchingServer:
    """Micro-batching inference loop: concurrent single-example requests are
    coalesced into fixed-size device batches (pad to `batch_size`, one
    compiled program) and the per-example results are scattered back.

    The classic serving trade-off knobs: `batch_size` bounds the padding
    waste, `max_wait_ms` bounds the latency a lone request pays waiting for
    company.  `fn` is any callable mapping a (batch_size, ...) array to a
    (batch_size, ...) result — a ServedModel, a jitted forward, or a
    generate closure over same-length prompts.
    """

    def __init__(self, fn, batch_size: int, max_wait_ms: float = 5.0):
        import queue as _queue
        import threading
        self.fn = fn
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1000.0
        self._q: "_queue.Queue" = _queue.Queue()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, x):
        """Enqueue one example; returns a concurrent.futures.Future."""
        from concurrent.futures import Future
        fut: Future = Future()
        self._q.put((np.asarray(x), fut))
        return fut

    def __call__(self, x):
        return self.submit(x).result()

    def _loop(self):
        import queue as _queue
        import time
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except _queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.batch_size:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except _queue.Empty:
                    break
            xs = np.stack([b[0] for b in batch])
            n = len(batch)
            if n < self.batch_size:              # pad to the compiled shape
                pad = np.repeat(xs[:1], self.batch_size - n, axis=0)
                xs = np.concatenate([xs, pad])
            try:
                ys = np.asarray(self.fn(xs))
                for i, (_, fut) in enumerate(batch):
                    fut.set_result(ys[i])
            except BaseException as e:
                for _, fut in batch:
                    if not fut.done():
                        fut.set_exception(e)

    def close(self):
        self._stop.set()
        self._thread.join(timeout=2)
