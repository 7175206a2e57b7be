"""Rectangular flash attention for KV-cache CONTINUATION prefill (fwd-only).

The serving cache path (models/generate.py `_block_with_kv`) runs chunked
prefill: S prompt tokens at absolute offset `pos` attend the whole filled
cache prefix [0, pos+S).  The fresh-prompt chunk (pos == 0) is plain causal
self-attention and rides the square flash kernels; every LATER chunk is
rectangular — S queries against Tk cached keys with the causal frontier at
`pos + i` — and previously fell to the dense cache form, whose
(B, NH, S, Tmax) score tensor is O(S·Tmax) HBM (1.5 GB/layer at S=512
against an 8K cache).  This module supplies the flash form of that
rectangle: the online-softmax tile kernel (`flash_attention._fwd_kernel`)
instantiated with separate q / k / v operands of different sequence
lengths and a static `q_off` folded into the causal/band predicates and the
edge masks.  Score tiles never touch HBM; KV tiles beyond the chunk's
causal frontier are never fetched (the kv grid stops at
ceil((pos+S)/block_k)).

Inference-only: no VJP (training never attends a detached cache — the
reference's backward, train_vit.rs:559-601, has no incremental-decode
analogue).  GQA-native: the cache's kv_dim-wide K/V (kv head g at channels
[g·D,(g+1)·D)) is read directly at kv width — each 128-lane KV block is
shared by its whole query group in VMEM, so continuation-prefill cache
traffic keeps the num_heads/kv_heads GQA saving (the point of GQA serving,
BASELINE.md round-5 rows).

The chunk offsets are STATIC (generate()'s prefill loop unrolls over Python
ints inside one jit), so each offset specializes its own kernel instance at
trace time — predicates and grids stay compile-time and tile skipping costs
nothing at runtime.  The kernels are shared across the layer scan, so an
8K/512-chunk prefill traces 15 rectangular instances, not 15 x L.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import flash_attention as FA
from . import flash_attention_gqa as GQA

LANES = FA.LANES

# Continuation chunks are latency-path work: 256-tiles keep the QH-scaled
# scratch small enough for the 6-query-head GQA cells under the default
# scoped-vmem stack, and the kv grid granularity fine enough that short
# chunks against long caches skip most tiles.
PREFILL_BLOCK = 256


def _geometry(num_heads: int, kv_heads: int, head_dim: int):
    """(QH, R, Wq, Wk, n_cells, chunk) or None when not tileable.

    MHA takes the square multi-tile forward's decomposition (G heads per
    128·G/64-lane cell); GQA takes the unified-kernel cell geometry
    (flash_attention_gqa._geom) with the cache's kv_dim as the K/V block
    width — which requires kv_dim 128-aligned (kv=1 at D=64 would need
    phantom-lane padding of the whole cache per chunk; it falls back)."""
    D = head_dim
    if D > LANES or LANES % D != 0:
        return None
    if kv_heads == num_heads:
        if num_heads % (LANES // D) != 0:
            return None
        G = FA._heads_per_block_multi_fwd(D, num_heads)
        return G, 1, G * D, G * D, num_heads // G, G
    QH, R, KVB, n_kvblk, _, kvd, kvd_pad = GQA._geom(num_heads, kv_heads, D)
    if kvd != kvd_pad or (QH * D) % LANES != 0:
        return None
    return QH, R, QH * D, LANES, n_kvblk, GQA._fwd_chunk(QH, PREFILL_BLOCK)


def supports_prefill(num_heads: int, kv_heads: int, head_dim: int) -> bool:
    return _geometry(num_heads, kv_heads, head_dim) is not None


def flash_prefill_qkv(q: jax.Array, k: jax.Array, v: jax.Array,
                      num_heads: int, kv_heads: int, q_offset: int,
                      sm_scale: Optional[float] = None, window: int = 0,
                      interpret: bool = False) -> jax.Array:
    """q (B, S, C) at absolute positions q_offset..q_offset+S-1 against
    k/v (B, Tk, kv_dim) caches holding positions 0..Tk-1 -> (B, S, C).

    Causal w.r.t. absolute positions (query i attends keys j <= i+q_offset;
    window > 0 additionally restricts to j > i+q_offset-window).  Cache
    slots >= q_offset+S are never read (kv grid + seq_len predicate), so
    unfilled tail slots may hold anything.  Rope callers pass q/k already
    rotated at absolute positions (the cache stores rotated K — the
    convention of models/generate._block_with_kv).  Requires
    Tk % PREFILL_BLOCK == 0 (cache allocation rounds up) and a
    `supports_prefill` geometry; fwd-only (no VJP)."""
    B, S, C = q.shape
    _, Tk, kvd = k.shape
    D = C // num_heads
    assert isinstance(q_offset, int) and q_offset >= 0, q_offset
    geom = _geometry(num_heads, kv_heads, D)
    assert geom is not None, (num_heads, kv_heads, D)
    QH, R, Wq, Wk, n_cells, chunk = geom
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    block_q = min(PREFILL_BLOCK, FA._ceil_to(S, LANES))
    block_k = PREFILL_BLOCK
    assert Tk % block_k == 0, (Tk, block_k)
    S_pad = FA._ceil_to(S, block_q)
    if S_pad != S:
        q = jnp.pad(q, ((0, 0), (0, S_pad - S), (0, 0)))
    seq_len = q_offset + S                     # the chunk's causal frontier
    n_q = S_pad // block_q
    n_kv = -(-seq_len // block_k)              # kv grid stops at the frontier
    assert n_kv * block_k <= Tk, (seq_len, Tk)
    kern = FA._no_tab(
        FA._fwd_kernel, 3, 2, sm_scale=float(sm_scale), causal=True,
        block_q=block_q, block_k=block_k, n_kv=n_kv, seq_len=seq_len,
        T=n_kv * block_k, QH=QH, R=R, D=D, chunk=chunk, window=window,
        rope=False, q_off=q_offset)
    q_spec = pl.BlockSpec((1, block_q, Wq), lambda b, h, i, j: (b, i, h),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, Wk), lambda b, h, i, j: (b, j, h),
                           memory_space=pltpu.VMEM)
    out, _lse = pl.pallas_call(
        kern,
        grid=(B, n_cells, n_q, n_kv),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=(
            pl.BlockSpec((1, block_q, Wq), lambda b, h, i, j: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QH, block_q, LANES),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, S_pad, C), q.dtype),
                   jax.ShapeDtypeStruct((B, num_heads, S_pad, LANES),
                                        jnp.float32)),
        scratch_shapes=[pltpu.VMEM((QH, block_q, LANES), jnp.float32),
                        pltpu.VMEM((QH, block_q, LANES), jnp.float32),
                        pltpu.VMEM((QH, block_q, D), jnp.float32)],
        compiler_params=FA._sems(False, "parallel", "parallel", "parallel",
                                 "arbitrary", vmem=GQA.GQA_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * num_heads * S * seq_len * D),
            bytes_accessed=int(2 * B * S * C
                               + 2 * B * n_kv * block_k * kvd),
            transcendentals=int(B * num_heads * S * seq_len)),
        interpret=interpret,
    )(q, k, v)
    return out[:, :S, :] if S_pad != S else out
