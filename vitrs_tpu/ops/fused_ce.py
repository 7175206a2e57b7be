"""Fused large-vocab cross-entropy (Pallas): one-pass streaming logsumexp.

The GPT loss reads (B*T, V) logits with V = 50257 — at GPT-2 124M B=16 the
logits are 1.65 GB bf16, and the loss path dominates non-matmul HBM traffic.
The stock XLA lowering of `cross_entropy_from_logits` (ops/basic.py) costs
four full passes over the logits per step:

  fwd:  max pass + exp/sum pass (logsumexp is two dependent reductions)
  bwd:  read logits to rebuild softmax + write f32 dlogits

This module reduces the forward to the information-theoretic minimum — ONE
read pass (a single-sweep Pallas logsumexp that also picks the target logit;
4.97 ms vs 13.2 ms for the standalone XLA logsumexp at B=16 on v5e).  The
backward is deliberately *not* a Pallas kernel: expressing
dlogits = (softmax - onehot) * g in plain jnp lets XLA duplicate the cheap
recompute into the operand fusions of the two consuming matmuls (dWte, dX of
the lm_head), so dlogits is never materialized at all — measured in-step this
beats the materializing Pallas backward by ~3 ms (128.0 vs 131.1 ms/step).
The Pallas backward kernel is kept behind `PALLAS_BWD` for cases where the
surrounding program denies XLA that fusion.

Vocab raggedness is the perf trap (measured, v5e): streaming a (16384, 50257)
bf16 array tops out at ~141 GB/s because every row starts mid-lane; padding
the vocab to 50304 (= 393*128, llm.c's own pad) restores lane alignment and
~308 GB/s with rows-only full-width blocks — 2-D (row, vocab-block) grids are
strictly worse (254 GB/s with a partial last block, 124 GB/s at small blocks).
The caller pads the lm_head (see models/model.py gpt_loss); `real_vocab`
masks the pad columns out of the logsumexp.

Semantics match ops/basic.cross_entropy_from_logits (the production form of
the reference's crossentropy_forward, rusty_vit.rs:836-843, with the llm.c
(p - onehot)/N backward the reference left undefined — gap G3): per-row
  loss = logsumexp(logits[:real_vocab]) - logits[target]
with the reduction math in fp32 regardless of the logits dtype.  dlogits is
written directly in the logits dtype (bf16 in production) because that is
what the consuming MXU matmuls (dWte, dX of the lm_head) eat anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_R = 32           # fwd rows per tile; full vocab width per block
BLOCK_R_BWD = 8        # bwd tile: in+out double-buffered + f32 intermediates
                       # must fit the 16 MiB VMEM scoped-alloc limit
NEG_INF = -1e30
PALLAS_BWD = False     # materializing bwd kernel; jnp bwd (XLA-fused) is
                       # faster in-step — see module docstring


def pad_vocab(v: int) -> int:
    """Next lane multiple (50257 -> 50304, llm.c's pad)."""
    return -(-v // LANES) * LANES


def supports(n_rows: int, vocab: int) -> bool:
    """Big-vocab lane-aligned shapes only; small heads (ViT) stay on XLA."""
    return vocab >= 16384 and vocab % LANES == 0 and n_rows % BLOCK_R == 0


# ---------------------------------------------------------------- forward

def _fwd_kernel(logits_ref, tgt_ref, lse_ref, picked_ref, *, real_vocab):
    tile = logits_ref[:].astype(jnp.float32)             # (R, Vp)
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    tile = jnp.where(col < real_vocab, tile, NEG_INF)
    m = jnp.max(tile, axis=-1, keepdims=True)            # (R, 1)
    s = jnp.sum(jnp.exp(tile - m), axis=-1, keepdims=True)
    lse_ref[:] = m + jnp.log(s)
    tgt = tgt_ref[:]                                     # (R, 1) i32
    picked_ref[:] = jnp.sum(jnp.where(col == tgt, tile, 0.0),
                            axis=-1, keepdims=True)


def _ce_fwd(logits, targets, real_vocab, interpret=False):
    R, Vp = logits.shape
    tgt2 = targets.astype(jnp.int32).reshape(R, 1)
    lse, picked = pl.pallas_call(
        functools.partial(_fwd_kernel, real_vocab=real_vocab),
        grid=(R // BLOCK_R,),
        in_specs=[
            pl.BlockSpec((BLOCK_R, Vp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 1), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_R, 1), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_R, 1), lambda r: (r, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((R, 1), jnp.float32),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(logits, tgt2)
    return lse[:, 0], picked[:, 0]


# ---------------------------------------------------------------- backward

def _bwd_kernel(logits_ref, tgt_ref, lse_ref, g_ref, dlogits_ref, *,
                real_vocab):
    tile = logits_ref[:].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1)
    p = jnp.exp(tile - lse_ref[:])                       # softmax row
    p = jnp.where(col < real_vocab, p, 0.0)
    onehot = (col == tgt_ref[:]).astype(jnp.float32)
    dlogits_ref[:] = ((p - onehot) * g_ref[:]).astype(dlogits_ref.dtype)


def _ce_bwd_dlogits(logits, targets, lse, g, real_vocab, interpret=False):
    R, Vp = logits.shape
    tgt2 = targets.astype(jnp.int32).reshape(R, 1)
    row_spec = pl.BlockSpec((BLOCK_R_BWD, 1), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, real_vocab=real_vocab),
        grid=(R // BLOCK_R_BWD,),
        in_specs=[
            pl.BlockSpec((BLOCK_R_BWD, Vp), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            row_spec, row_spec, row_spec,
        ],
        out_specs=pl.BlockSpec((BLOCK_R_BWD, Vp), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, Vp), logits.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(logits, tgt2, lse.reshape(R, 1), g.reshape(R, 1))


# ---------------------------------------------------------------- public

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cross_entropy_rows(logits, targets, real_vocab, interpret=False):
    """Per-row -log softmax(logits[:real_vocab])[target].

    logits (R, Vp) with Vp lane-aligned (columns >= real_vocab are pad and
    are masked out); targets (R,) int in [0, real_vocab).
    """
    lse, picked = _ce_fwd(logits, targets, real_vocab, interpret)
    return lse - picked


def _vjp_fwd(logits, targets, real_vocab, interpret):
    lse, picked = _ce_fwd(logits, targets, real_vocab, interpret)
    return lse - picked, (logits, targets, lse)


def _vjp_bwd(real_vocab, interpret, res, g):
    logits, targets, lse = res
    if PALLAS_BWD:
        return (_ce_bwd_dlogits(logits, targets, lse, g, real_vocab,
                                interpret), None)
    col = jnp.arange(logits.shape[-1])
    p = jnp.exp(logits.astype(jnp.float32) - lse[:, None])
    p = jnp.where(col < real_vocab, p, 0.0)
    onehot = (col[None, :] == targets[:, None]).astype(jnp.float32)
    return (((p - onehot) * g[:, None]).astype(logits.dtype), None)


cross_entropy_rows.defvjp(_vjp_fwd, _vjp_bwd)


def cross_entropy_mean(logits, targets, real_vocab=None, interpret=False):
    """Mean-over-rows fused CE; logits (..., Vp) any leading shape.

    Falls back to the dense XLA form (on the first `real_vocab` columns) for
    shapes the kernel does not cover.
    """
    Vp = logits.shape[-1]
    rv = Vp if real_vocab is None else real_vocab
    flat = logits.reshape(-1, Vp)
    t = targets.reshape(-1)
    if not supports(flat.shape[0], Vp):
        from vitrs_tpu.ops import basic
        return jnp.mean(basic.cross_entropy_from_logits(
            flat[:, :rv], t))
    return jnp.mean(cross_entropy_rows(flat, t, rv, interpret))
