"""Async + multi-host-sharded checkpointing (ROADMAP 7 / VERDICT r1 next #8).

At ViT-L/GPT-2 sizes the checkpoint payload is 0.5-1.5 GB; a synchronous
device_get + write() stalls the training loop for seconds.  Two pieces:

* **AsyncCheckpointer** — `save()` enqueues DEVICE-SIDE copies of every leaf
  (no host sync; costs one HBM round-trip) and returns immediately; a writer
  thread then device_gets the copies and writes the reference-format file
  (checkpoint.save_checkpoint, atomic tmp+rename).  The device copy is what
  makes this safe: the train step donates params/m/v, so the live buffers
  held at save() time are invalidated by the NEXT step — the snapshot must
  not alias them.  At most `max_inflight` saves are pending; `save()` blocks
  only when the previous write hasn't finished (bounded host memory), and
  `wait()` drains.  Snapshot semantics: the bytes written are the values at
  save()-call time regardless of how far training has advanced.

* **save_checkpoint_sharded** — multi-host range writes through the native
  ckptio pwrite path: every host writes its contiguous byte range of the
  payload into one pre-sized file (vitrs_alloc_file + vitrs_write_range),
  host 0 also writes the header/cursor.  The resulting file is identical to
  a single-host save_checkpoint and loads with checkpoint.load_checkpoint.
"""

from __future__ import annotations

import ctypes
import os
import queue
import threading
from typing import Dict, Optional

import numpy as np

from . import checkpoint as ckpt_io
from .config import ViTConfig
from .params import num_parameters, param_shapes, tensor_order


class AsyncCheckpointer:
    def __init__(self, max_inflight: int = 1):
        self._q: queue.Queue = queue.Queue(maxsize=max_inflight)
        self._exc: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import jax
        while True:
            item = self._q.get()
            if item is None:
                return
            try:
                path, dev_tree, cfg, kw = item
                host = jax.device_get(dev_tree)
                ckpt_io.save_checkpoint(path, host["params"], cfg,
                                        m=host.get("m"), v=host.get("v"), **kw)
            except BaseException as e:      # surfaced on next save()/wait()
                self._exc = e
            finally:
                self._q.task_done()

    def save(self, path: str, params: Dict, cfg: ViTConfig,
             m=None, v=None, step: int = 0, seed: int = 0, cursor: int = 0,
             n_valid: Optional[int] = None):
        """Snapshot + schedule a write; returns as soon as the device-side
        copies are enqueued.  m/v may be device arrays (ZeRO-1-sharded is
        fine); n_valid trims flat opt-state padding."""
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc
        import jax.numpy as jnp
        snap = {"params": {k: jnp.copy(a) for k, a in params.items()}}
        if m is not None:
            m_c = jnp.copy(m)
            v_c = jnp.copy(v)
            if n_valid is not None:
                m_c, v_c = m_c[:n_valid], v_c[:n_valid]
            snap["m"], snap["v"] = m_c, v_c
        # blocks only if the previous save hasn't drained (bounded memory)
        self._q.put((path, snap, cfg,
                     dict(step=step, seed=seed, cursor=cursor)))

    def wait(self):
        self._q.join()
        if self._exc is not None:
            exc, self._exc = self._exc, None
            raise exc

    def close(self):
        self.wait()
        self._q.put(None)
        self._thread.join(timeout=5)


# ---------------------------------------------------------------------------
# multi-host range-sharded writes
# ---------------------------------------------------------------------------

def _barrier(name: str) -> None:
    """Cross-process sync point; no-op single-process (shared-filesystem
    multi-host writes need ordering: alloc before pwrite, all pwrites before
    any reader)."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def _native():
    from .native import build
    lib = build.load("ckptio")
    if lib is None:
        return None
    try:
        if lib.vitrs_ckptio_abi() != 1:
            return None
    except Exception:
        return None
    return lib


def _write_range(path: str, offset: int, data: np.ndarray):
    data = np.ascontiguousarray(data)
    raw = data.view(np.uint8).reshape(-1)
    lib = _native()
    if lib is not None:
        rc = lib.vitrs_write_range(
            path.encode(), ctypes.c_int64(offset),
            ctypes.c_int64(raw.nbytes),
            raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int(min(os.cpu_count() or 1, 8)))
        if rc == 0:
            return
    with open(path, "r+b") as f:
        f.seek(offset)
        f.write(raw.tobytes())


def _alloc(path: str, size: int):
    lib = _native()
    if lib is not None and lib.vitrs_alloc_file(path.encode(),
                                                ctypes.c_int64(size)) == 0:
        return
    with open(path, "wb") as f:
        f.truncate(size)


def save_checkpoint_sharded(path: str, cfg: ViTConfig, host_id: int,
                            num_hosts: int,
                            params: Optional[Dict] = None,
                            m: Optional[np.ndarray] = None,
                            v: Optional[np.ndarray] = None,
                            step: int = 0, seed: int = 0, cursor: int = 0):
    """Each host writes its 1/num_hosts range of the payload into ONE file.

    params must be the full (replicated) pytree on every host — each host
    serializes only its flat byte range.  m/v, when given, must be the FULL
    flat arrays (n,) on each host (gather ZeRO-1 shards first or pass the
    host's range via the m/v slicing below).  File layout matches
    checkpoint.save_checkpoint exactly; any host can load_checkpoint it.
    """
    assert 0 <= host_id < num_hosts
    n = num_parameters(cfg)
    has_opt = m is not None and v is not None
    version = 2 if (cfg.mode == "vit" or has_opt or step or seed) else 1
    payload = n * 4 * (3 if has_opt else 1)
    total = ckpt_io.HEADER_BYTES + payload + (8 if has_opt else 0)

    if host_id == 0:
        _alloc(path, total)
        h = ckpt_io._header(cfg, version, step, has_opt, seed)
        _write_range(path, 0, h)
        if has_opt:
            _write_range(path, ckpt_io.HEADER_BYTES + n * 12,
                         np.int64([cursor]))
    _barrier("vitrs_ckpt_alloc")   # nobody pwrites before host 0 sized the
    #                                file (race found by the executed
    #                                2-process test, tests/test_multihost.py)

    # host's contiguous f32 range of [params | m | v]
    total_f32 = n * (3 if has_opt else 1)
    per = (total_f32 + num_hosts - 1) // num_hosts
    lo = host_id * per
    hi = min(lo + per, total_f32)
    if lo >= hi:
        _barrier("vitrs_ckpt_done")     # single exit: match writers' barrier
        return

    # assemble the host's range without materializing the full flat vector
    # beyond what it owns: params region is [0, n), m is [n, 2n), v [2n, 3n)
    shapes = param_shapes(cfg)
    out = np.empty(hi - lo, np.float32)
    pos = 0          # running offset in the conceptual [params|m|v] vector
    want_lo, want_hi = lo, hi

    def emit(arr_flat: np.ndarray, start: int):
        a, b = max(want_lo, start), min(want_hi, start + arr_flat.size)
        if a < b:
            out[a - want_lo:b - want_lo] = arr_flat[a - start:b - start]

    for name in tensor_order(cfg):
        size = int(np.prod(shapes[name]))
        if pos + size > want_lo and pos < want_hi:
            emit(np.asarray(params[name], np.float32).reshape(-1), pos)
        pos += size
    if has_opt:
        emit(np.asarray(m, np.float32).reshape(-1), n)
        emit(np.asarray(v, np.float32).reshape(-1), 2 * n)
    _write_range(path, ckpt_io.HEADER_BYTES + lo * 4, out)
    _barrier("vitrs_ckpt_done")   # returning => the file is complete on the
    #                               shared filesystem for every process
