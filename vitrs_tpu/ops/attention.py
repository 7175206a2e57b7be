"""Attention dispatch: Pallas flash attention on TPU, dense XLA fallback.

The reference materializes the full O(B*NH*T^2) `preatt`/`att` buffers in HBM
(rusty_vit.rs:157-158) and loops scalar-wise (rusty_vit.rs:512-563).  The
production path here is a blockwise online-softmax Pallas kernel that never
writes the score matrix to HBM; the dense path (ops/basic.py) keeps the
reference's stash semantics for parity tests and non-TPU backends.
"""

from __future__ import annotations

import functools

import jax

from . import basic


@functools.cache
def _flash_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def attention(qkv: jax.Array, num_heads: int, causal: bool = True,
              quirks: bool = False, use_flash: bool = True) -> jax.Array:
    """Multi-head attention over packed qkv (B, T, 3C) -> (B, T, C)."""
    if quirks or not use_flash or not _flash_available():
        out, _ = basic.attention_dense(qkv, num_heads, causal=causal,
                                       quirks=quirks)
        return out
    from .flash_attention import flash_attention_qkv
    return flash_attention_qkv(qkv, num_heads, causal=causal)
