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
              window: int = 0, rope: bool = False) -> jax.Array:
    """Multi-head attention over packed qkv (B, T, 3C) -> (B, T, C).
    window > 0 (causal only) = sliding-window attention.

    rope=True takes UNROTATED qkv and applies rotary embeddings at
    positions 0..T-1 — inside the flash kernels on the Pallas path
    (streamed-table rotation, ops/flash_attention._rope_table; dq/dk come
    back inverse-rotated), via an explicit rope_qk pass on the dense path.
    One contract for both, so callers (e.g. the TP block) never rotate."""
    assert causal or not window, "sliding-window attention is causal-only"
    if quirks or not use_flash or not _flash_available():
        if rope:
            from .rope import rope_qk
            C = num_heads * (qkv.shape[-1] // (3 * num_heads))
            q, k = rope_qk(qkv[..., :C], qkv[..., C:2 * C],
                           jnp.arange(qkv.shape[1]), num_heads, num_heads)
            qkv = jnp.concatenate([q, k, qkv[..., 2 * C:]], axis=-1)
        out, _ = basic.attention_dense(qkv, num_heads, causal=causal,
                                       quirks=quirks, window=window)
        return out
    from .flash_attention import flash_attention_qkv
    return flash_attention_qkv(qkv, num_heads, causal=causal, window=window,
                               rope=rope)


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


def _expand_row_index(num_heads: int, kv_heads: int, head_size: int):
    """Static row gather (length 3C) mapping the packed-MHA output channels
    onto the packed-GQA projection's rows: q rows pass through, each KV
    head's D rows repeat for its G = num_heads//kv_heads query heads."""
    import numpy as np
    C = num_heads * head_size
    kvd = kv_heads * head_size
    G = num_heads // kv_heads
    q = np.arange(C)
    base = np.arange(kv_heads * head_size).reshape(kv_heads, head_size)
    kv = np.repeat(base, G, axis=0).reshape(-1)          # head h -> h//G
    return np.concatenate([q, C + kv, C + kvd + kv])


def expand_qkv_weight(qkvw: jax.Array, qkvb, num_heads: int,
                      kv_heads: int):
    """GQA packed projection weight (..., C+2*kv_dim, IC) -> MHA
    (..., 3C, IC) by repeating each KV head's D output ROWS for its query
    group, so the projection EMITS the full-head packed layout straight off
    the MXU: linear(x, expand_w) == expand_packed(linear(x, w)) exactly.

    Measured OUTCOME at GPT-2 124M MQA (CLAUDE.md negatives #3): projecting
    with the expanded (3C, C) weight costs ~17 ms/step more MXU than the
    small projection saves in activation-expansion HBM — so the HOT paths
    (fused_qkv_attention, selective remat, TP) all project SMALL and expand
    activations; this helper serves the dense fallback (model.py plain
    composition) and any consumer that wants the one-matmul form.  Full-head
    q/k rotate identically per head, so rope composes either side of it."""
    if not kv_heads or kv_heads == num_heads:
        return qkvw, qkvb
    D = qkvw.shape[-2] // (num_heads + 2 * kv_heads)
    idx = jnp.asarray(_expand_row_index(num_heads, kv_heads, D))
    w = jnp.take(qkvw, idx, axis=-2)
    b = None if qkvb is None else jnp.take(qkvb, idx, axis=-1)
    return w, b


def reduce_qkv_weight_grad(dw: jax.Array, dbias, num_heads: int,
                           kv_heads: int):
    """Transpose of expand_qkv_weight for hand-written VJPs: sum the
    expanded (..., 3C, IC) weight grad's K/V rows back per group to
    (..., C+2*kv_dim, IC)."""
    if not kv_heads or kv_heads == num_heads:
        return dw, dbias
    C = dw.shape[-2] // 3
    D = C // num_heads
    G = num_heads // kv_heads
    lead = dw.shape[:-2]
    IC = dw.shape[-1]

    def red(part):          # (..., C, IC) -> (..., kv_dim, IC)
        return part.reshape(lead + (kv_heads, G, D, IC)).sum(
            axis=len(lead) + 1).reshape(lead + (kv_heads * D, IC))

    dq, dk, dv = dw[..., :C, :], dw[..., C:2 * C, :], dw[..., 2 * C:, :]
    out = jnp.concatenate([dq, red(dk), red(dv)], axis=-2)
    if dbias is None:
        return out, None

    def redb(part):
        return part.reshape(lead + (kv_heads, G, D)).sum(
            axis=len(lead) + 1).reshape(lead + (kv_heads * D,))

    bq, bk, bv = (dbias[..., :C], dbias[..., C:2 * C], dbias[..., 2 * C:])
    return out, jnp.concatenate([bq, redb(bk), redb(bv)], axis=-1)


def attention_gqa(qkv: jax.Array, num_heads: int, kv_heads: int,
                  causal: bool = True, use_flash: bool = True,
                  window: int = 0) -> jax.Array:
    """Grouped-query attention over a packed GQA projection
    (B, T, C + 2*kv_dim) -> (B, T, C): expand K/V to the full head count
    and ride the standard packed path (flash on TPU, dense elsewhere)."""
    packed = expand_packed(qkv, num_heads, kv_heads)
    return attention(packed, num_heads, causal=causal, use_flash=use_flash,
                     window=window)
