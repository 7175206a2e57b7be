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
import jax.numpy as jnp

from . import basic


@functools.cache
def _flash_available() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def attention(qkv: jax.Array, num_heads: int, causal: bool = True,
              quirks: bool = False, use_flash: bool = True,
              window: int = 0) -> jax.Array:
    """Multi-head attention over packed qkv (B, T, 3C) -> (B, T, C).
    window > 0 (causal only) = sliding-window attention."""
    assert causal or not window, "sliding-window attention is causal-only"
    if quirks or not use_flash or not _flash_available():
        out, _ = basic.attention_dense(qkv, num_heads, causal=causal,
                                       quirks=quirks, window=window)
        return out
    from .flash_attention import flash_attention_qkv
    return flash_attention_qkv(qkv, num_heads, causal=causal, window=window)


def expand_kv_heads(kv: jax.Array, kv_heads: int, num_heads: int) -> jax.Array:
    """GQA/MQA K-or-V expansion: (B, T, kv_heads*D) -> (B, T, num_heads*D).

    KV head g is shared by the G = num_heads//kv_heads consecutive query
    heads [g*G, (g+1)*G) (the Llama/GQA convention).  jnp.repeat on the head
    axis; its autodiff transpose is the per-group segment sum, which is
    exactly the GQA dk/dv reduction — so the packed flash kernel (an MHA
    kernel) serves GQA with correct gradients for free."""
    if kv_heads == num_heads:
        return kv
    B, T, kvd = kv.shape
    D = kvd // kv_heads
    G = num_heads // kv_heads
    return jnp.repeat(kv.reshape(B, T, kv_heads, D), G,
                      axis=2).reshape(B, T, num_heads * D)


def split_gqa(qkv: jax.Array, num_heads: int, kv_heads: int):
    """Split a packed GQA projection (B, T, C + 2*kv_dim) into q/k/v parts.
    C = num_heads*D, kv_dim = kv_heads*D — solved from the static packed
    width W = (num_heads + 2*kv_heads)*D."""
    W = qkv.shape[-1]
    C = W * num_heads // (num_heads + 2 * kv_heads)
    kvd = (W - C) // 2
    return qkv[..., :C], qkv[..., C:C + kvd], qkv[..., C + kvd:]


def expand_packed(qkv: jax.Array, num_heads: int, kv_heads: int
                  ) -> jax.Array:
    """Packed GQA projection (B, T, C + 2*kv_dim) -> packed MHA (B, T, 3C):
    the ONE place the packed-GQA slicing + group expansion convention lives
    (training path, selective remat, and the rope branch all call this)."""
    if not kv_heads or kv_heads == num_heads:
        return qkv
    q, k, v = split_gqa(qkv, num_heads, kv_heads)
    return jnp.concatenate([q, expand_kv_heads(k, kv_heads, num_heads),
                            expand_kv_heads(v, kv_heads, num_heads)], axis=-1)


def attention_gqa(qkv: jax.Array, num_heads: int, kv_heads: int,
                  causal: bool = True, use_flash: bool = True,
                  window: int = 0) -> jax.Array:
    """Grouped-query attention over a packed GQA projection
    (B, T, C + 2*kv_dim) -> (B, T, C): expand K/V to the full head count
    and ride the standard packed path (flash on TPU, dense elsewhere)."""
    packed = expand_packed(qkv, num_heads, kv_heads)
    return attention(packed, num_heads, causal=causal, use_flash=use_flash,
                     window=window)
