"""Binary checkpoint format — reference-compatible, with a versioned v2 extension.

Reference format (/root/reference/train_vit.rs:89-143, rusty_vit.rs:79-129):
a header region of 1024 bytes followed by `num_parameters` f32s in the canonical
16-tensor order (SURVEY.md §2.1).  The Rust port reads the header as raw *bytes*
(`[0u8; 256]`, train_vit.rs:91) which cannot represent vocab 50257 (reference gap
G9); llm.c — which the reference ports — reads i32[256].  We read/write i32[256],
the deliberate fix recorded in SURVEY.md §2.6.

Header layout (i32 little-endian, 256 entries = 1024 bytes):
  h[0]  magic   = 20240326   (llm.c's magic; the reference ignores it)
  h[1]  version = 1 (core-16 payload only) | 2 (vit extensions + optimizer state)
  h[2]  max_seq_len
  h[3]  vocab_size
  h[4]  num_layers
  h[5]  num_heads
  h[6]  channels
  -- v2 extension fields (0 in v1 files) --
  h[7]  mode          0=gpt 1=vit
  h[8]  img_size
  h[9]  patch_size
  h[10] in_chans
  h[11] num_classes
  h[12] pool          0=cls 1=mean
  h[13] step          (training step for resume)
  h[14] has_opt_state 0|1   (AdamW m and v follow the params, same length each)
  h[15] rng_seed      (PRNG key seed for deterministic resume)
  h[16] num_kv_heads  0=MHA | k = GQA/MQA K/V head count (qkvw is
                      (L, C+2·k·D, C) instead of (L, 3C, C))
  h[17] pos_emb       0=learned wpe | 1=rope (wpe tensor present but unused)
  h[18] window        0=full attention | W = sliding-window width
  h[19] num_experts   0=dense MLP | E = MoE experts/layer (fcw/fcb/fcprojw/
                      fcprojb grow a leading E axis; a routerw (L,E,C)
                      tensor follows the other extension tensors)
  h[20] moe_top_k     experts run per token (0 when dense)

Payload: all parameter tensors as contiguous f32 in canonical order — the 16
reference tensors first, then (v2, vit mode) the VIT_EXT tensors.  If
has_opt_state, two more flat arrays (m, v) of the same total length, then one
i64 dataloader cursor.  A v1 reference-format file therefore loads directly.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional, Tuple

import numpy as np

from .config import ViTConfig
from .params import param_shapes, tensor_order, num_parameters

MAGIC = 20240326
HEADER_I32 = 256
HEADER_BYTES = 1024

# native fast path threshold: below this, plain python I/O wins on latency
_NATIVE_MIN_BYTES = 32 << 20


def _native_lib():
    from .native import build
    lib = build.load("ckptio")
    if lib is not None:
        try:
            if lib.vitrs_ckptio_abi() != 1:
                return None
            lib.vitrs_file_size.restype = ctypes.c_int64
        except Exception:
            return None
    return lib


def _read_range(path: str, offset: int, nbytes: int) -> np.ndarray:
    """Read a byte range — multi-threaded native pread when worthwhile."""
    lib = _native_lib() if nbytes >= _NATIVE_MIN_BYTES else None
    if lib is not None:
        out = np.empty(nbytes, np.uint8)
        rc = lib.vitrs_read_range(
            path.encode(), ctypes.c_int64(offset), ctypes.c_int64(nbytes),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int(min(os.cpu_count() or 1, 8)))
        if rc == 0:
            return out
    with open(path, "rb") as f:
        f.seek(offset)
        buf = f.read(nbytes)
    return np.frombuffer(buf, np.uint8)


def _header(cfg: ViTConfig, version: int, step: int, has_opt: bool, seed: int) -> np.ndarray:
    h = np.zeros(HEADER_I32, dtype=np.int32)
    h[0] = MAGIC
    h[1] = version
    h[2] = cfg.max_seq_len
    h[3] = cfg.vocab_size
    h[4] = cfg.num_layers
    h[5] = cfg.num_heads
    h[6] = cfg.channels
    if version >= 2:
        h[7] = 1 if cfg.mode == "vit" else 0
        h[8] = cfg.img_size
        h[9] = cfg.patch_size
        h[10] = cfg.in_chans
        h[11] = cfg.num_classes
        h[12] = 1 if cfg.pool == "mean" else 0
        h[13] = step
        h[14] = 1 if has_opt else 0
        h[15] = seed
        h[16] = cfg.num_kv_heads
        h[17] = 1 if cfg.pos_emb == "rope" else 0
        h[18] = cfg.window
        h[19] = cfg.num_experts
        h[20] = cfg.moe_top_k if cfg.num_experts else 0
    return h


def config_from_header(h: np.ndarray) -> ViTConfig:
    version = int(h[1]) if int(h[0]) == MAGIC else 1
    kw = dict(max_seq_len=int(h[2]), vocab_size=int(h[3]), num_layers=int(h[4]),
              num_heads=int(h[5]), channels=int(h[6]))
    if version >= 2 and int(h[7]) == 1:
        kw.update(mode="vit", img_size=int(h[8]), patch_size=int(h[9]),
                  in_chans=int(h[10]), num_classes=int(h[11]),
                  pool="mean" if int(h[12]) == 1 else "cls")
    if version >= 2 and int(h[16]):
        kw.update(num_kv_heads=int(h[16]))
    if version >= 2 and int(h[17]) == 1:
        kw.update(pos_emb="rope")
    if version >= 2 and int(h[18]):
        kw.update(window=int(h[18]))
    if version >= 2 and int(h[19]):
        kw.update(num_experts=int(h[19]), moe_top_k=int(h[20]))
    return ViTConfig(**kw).validate()


def save_checkpoint(path: str,
                    params: Dict,
                    cfg: ViTConfig,
                    m: Optional[np.ndarray] = None,
                    v: Optional[np.ndarray] = None,
                    step: int = 0,
                    seed: int = 0,
                    cursor: int = 0) -> None:
    """Full round-trip writer — completes the reference's wte-only stub (G8,
    train_vit.rs:715-735 'Save other parameters similarly')."""
    has_opt = m is not None and v is not None
    version = 2 if (cfg.mode == "vit" or has_opt or step or seed
                    or cfg.num_kv_heads or cfg.pos_emb == "rope"
                    or cfg.window or cfg.num_experts) else 1
    h = _header(cfg, version, step, has_opt, seed)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(h.tobytes())
        for name in tensor_order(cfg):
            arr = np.asarray(params[name], dtype=np.float32)
            f.write(np.ascontiguousarray(arr).tobytes())
        if has_opt:
            f.write(np.asarray(m, dtype=np.float32).tobytes())
            f.write(np.asarray(v, dtype=np.float32).tobytes())
            f.write(np.int64(cursor).tobytes())
    os.replace(tmp, path)  # atomic publish so a crash never corrupts the latest ckpt


def load_checkpoint(path: str, cfg: Optional[ViTConfig] = None
                    ) -> Tuple[Dict[str, np.ndarray], ViTConfig, dict]:
    """Read a checkpoint; the file header is the config source of truth
    (reference behavior: config decoded from header, train_vit.rs:94-113).

    Returns (params, config, extras) where extras holds step/m/v/seed/cursor
    when present (v2).
    """
    with open(path, "rb") as f:
        h = np.frombuffer(f.read(HEADER_BYTES), dtype=np.int32)
        if int(h[0]) != MAGIC:
            raise ValueError(f"bad magic {int(h[0])} (expected {MAGIC}) in {path}")
        if int(h[1]) not in (1, 2):
            # llm.c reuses magic 20240326 with version 3 for bf16 payloads;
            # reinterpreting those as f32 would load garbage silently.
            raise ValueError(
                f"unsupported checkpoint version {int(h[1])} in {path}: only "
                f"versions 1 (f32 core-16) and 2 (vit/opt-state extension) are "
                f"readable; llm.c bf16 exports (version 3) are not")
        file_cfg = config_from_header(h)
        if cfg is not None:
            # caller may override impl switches but core geometry must agree
            for f_name in ("max_seq_len", "vocab_size", "num_layers", "num_heads",
                           "channels"):
                if getattr(cfg, f_name) != getattr(file_cfg, f_name):
                    raise ValueError(
                        f"config mismatch on {f_name}: caller has "
                        f"{getattr(cfg, f_name)}, file has "
                        f"{getattr(file_cfg, f_name)}")
            file_cfg = cfg
    shapes = param_shapes(file_cfg)
    n = num_parameters(file_cfg)
    file_size = os.path.getsize(path)
    if file_size < HEADER_BYTES + n * 4:
        # find the first tensor that doesn't fit, for a precise error
        off = 0
        avail = max(0, file_size - HEADER_BYTES) // 4
        for name in tensor_order(file_cfg):
            off += int(np.prod(shapes[name]))
            if off > avail:
                raise ValueError(f"truncated checkpoint at tensor {name}")
    flat = _read_range(path, HEADER_BYTES, n * 4).view(np.float32)
    params, off = {}, 0
    for name in tensor_order(file_cfg):
        size = int(np.prod(shapes[name]))
        params[name] = flat[off:off + size].reshape(shapes[name]).copy()
        off += size
    extras = {"step": int(h[13]), "seed": int(h[15]), "m": None, "v": None,
              "cursor": 0}
    if int(h[1]) >= 2 and int(h[14]) == 1:
        opt_off = HEADER_BYTES + n * 4
        opt = _read_range(path, opt_off, n * 8).view(np.float32)
        extras["m"] = opt[:n].copy()
        extras["v"] = opt[n:].copy()
        if file_size >= opt_off + n * 8 + 8:
            cur = _read_range(path, opt_off + n * 8, 8).view(np.int64)
            extras["cursor"] = int(cur[0])
    return params, file_cfg, extras
