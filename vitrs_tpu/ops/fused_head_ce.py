"""Fused lm-head matmul + cross-entropy epilogue (Pallas).

The GPT loss path ends in
    logits = lnf @ wte_p.T          (R, Vp) — 2.53 TFLOP at 124M B=32
    loss   = logsumexp(logits) - logits[target]
Even with the one-pass streaming CE (ops/fused_ce.py), the forward costs one
full extra HBM pass over the (R, Vp) logits — ~10 ms at B=32/Vp=50304 on
v5e, pure read bandwidth, because XLA cannot fuse a cross-row reduction into
a matmul root.  This kernel computes the head matmul tile by tile and folds
the CE statistics into the MXU epilogue: each (R_blk, V_blk) logits tile is
reduced into a running online (max, sumexp) pair plus the picked target
logit WHILE it is still in VMEM, so the standalone CE pass disappears.

The logits ARE still written to HBM: the backward (identical to
ops/fused_ce.py's — dlogits = (softmax − onehot)·g in plain jnp, which XLA
fuses into the dWte/dX consumer matmuls so dlogits never materializes)
recomputes softmax from the saved logits + lse.  The forward write is
overlapped with the matmul compute; the saving is precisely the eliminated
read pass.

Grid: (row blocks, vocab blocks), vocab innermost and sequential
("arbitrary") so the online statistics accumulate in VMEM scratch; rows
parallel.  The row panel of lnf stays resident across the vocab sweep
(Pallas refetches an input block only when its index changes), so HBM
traffic is wte re-streamed once per ROW PANEL — R_blk=2048 keeps that at
1.2 GB against the 16.6 ms of matmul compute (compute-bound).

MEASURED NEUTRAL-TO-NEGATIVE at GPT-2 124M B=32 on v5e (ENABLE=False):
144.2k tok/s at R_blk=1024 and 144.5k at R_blk=2048 vs 145.1k for the
two-op path (XLA head matmul + ops/fused_ce one-pass CE).  The standalone
CE read pass this kernel eliminates is evidently already overlapped with
neighboring work at the step level, and XLA's GEMM schedule is a touch
faster than this Mosaic one — the same verdict as the fused-LN+matmul and
Pallas-CE-backward attempts (CLAUDE.md negative results).  Kept as a
correct, tested op for programs where the surrounding schedule denies XLA
that overlap.

Reference anchor: the head projection + CE is rusty_vit.rs:336-347 (tied
wte head, mean CE); the padded-vocab convention is llm.c's 50304 pad
(models/model.gpt_loss).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_ce import NEG_INF, pad_vocab  # noqa: F401  (shared convention)

LANES = 128
ENABLE = False    # measured neutral at 124M B=32 — see module docstring
BLOCK_R = 2048    # row panel: lnf block resident across the vocab sweep
BLOCK_V = 384     # vocab tile: 50304 = 131 * 384 (384 = 3 lanes of 128)
VMEM_LIMIT = 64 * 1024 * 1024   # f32 epilogue tiles at R_blk=2048 overflow
                                # the 16 MB default scoped-vmem stack


def supports(n_rows: int, vocab_padded: int, channels: int) -> bool:
    """Kernel geometry gate; non-tileable shapes stay on the two-op path."""
    return (n_rows % BLOCK_R == 0 and vocab_padded % BLOCK_V == 0
            and channels % LANES == 0)


def _kernel(x_ref, w_ref, tgt_ref, logits_ref, lse_ref, picked_ref,
            m_ref, s_ref, pk_ref, *, real_vocab, nv):
    v = pl.program_id(1)

    @pl.when(v == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        pk_ref[:] = jnp.zeros_like(pk_ref)

    # MXU: (R_blk, C) x (V_blk, C)^T with fp32 accumulate
    tile = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (R_blk, V_blk) f32
    logits_ref[:] = tile.astype(logits_ref.dtype)

    # epilogue: online logsumexp + target pick, masked past the real vocab
    col = jax.lax.broadcasted_iota(jnp.int32, tile.shape, 1) + v * BLOCK_V
    tile = jnp.where(col < real_vocab, tile, NEG_INF)
    m_new = jnp.maximum(m_ref[:], jnp.max(tile, axis=-1, keepdims=True))
    s_ref[:] = (s_ref[:] * jnp.exp(m_ref[:] - m_new)
                + jnp.sum(jnp.exp(tile - m_new), axis=-1, keepdims=True))
    m_ref[:] = m_new
    pk_ref[:] += jnp.sum(jnp.where(col == tgt_ref[:], tile, 0.0),
                         axis=-1, keepdims=True)

    @pl.when(v == nv - 1)
    def _flush():
        lse_ref[:] = m_ref[:] + jnp.log(s_ref[:])
        picked_ref[:] = pk_ref[:]


def _head_ce_fwd(lnf2, wte_p, targets, real_vocab, interpret=False):
    """lnf2 (R, C), wte_p (Vp, C), targets (R,) ->
    (logits (R, Vp) lnf.dtype, lse (R, 1) f32, picked (R, 1) f32)."""
    R, C = lnf2.shape
    Vp = wte_p.shape[0]
    nv = Vp // BLOCK_V
    tgt2 = targets.astype(jnp.int32).reshape(R, 1)
    grid = (R // BLOCK_R, nv)
    row1 = pl.BlockSpec((BLOCK_R, 1), lambda r, v: (r, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, real_vocab=real_vocab, nv=nv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_R, C), lambda r, v: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK_V, C), lambda r, v: (v, 0),
                         memory_space=pltpu.VMEM),
            row1,
        ],
        out_specs=(
            pl.BlockSpec((BLOCK_R, BLOCK_V), lambda r, v: (r, v),
                         memory_space=pltpu.VMEM),
            row1, row1),
        out_shape=(jax.ShapeDtypeStruct((R, Vp), lnf2.dtype),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32),
                   jax.ShapeDtypeStruct((R, 1), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((BLOCK_R, 1), jnp.float32),
                        pltpu.VMEM((BLOCK_R, 1), jnp.float32),
                        pltpu.VMEM((BLOCK_R, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(lnf2, wte_p, tgt2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def head_ce_mean(lnf, wte_p, targets, real_vocab, interpret=False):
    """mean CE of softmax(lnf @ wte_p.T) vs targets, logits never re-read in
    the forward.  lnf (B, T, C) or (R, C); wte_p (Vp, C) lane-padded;
    targets int (B, T) / (R,)."""
    loss, _ = _fwd(lnf, wte_p, targets, real_vocab, interpret)
    return loss


def _fwd(lnf, wte_p, targets, real_vocab, interpret):
    C = lnf.shape[-1]
    x2 = lnf.reshape(-1, C)
    t = targets.reshape(-1)
    logits, lse, picked = _head_ce_fwd(x2, wte_p, t, real_vocab, interpret)
    loss = jnp.mean(lse[:, 0] - picked[:, 0])
    return loss, (lnf, wte_p, t, logits, lse)


def _bwd(real_vocab, interpret, res, g):
    lnf, wte_p, t, logits, lse = res
    C = lnf.shape[-1]
    R, Vp = logits.shape
    # dloss/dlogits = (softmax - onehot) * g / R, recomputed in plain jnp so
    # XLA fuses it into BOTH consumer matmuls (dlogits never materializes —
    # the measured-fastest form, see ops/fused_ce.py docstring)
    col = jnp.arange(Vp)
    p = jnp.exp(logits.astype(jnp.float32) - lse)
    p = jnp.where(col < real_vocab, p, 0.0)
    onehot = (col[None, :] == t[:, None]).astype(jnp.float32)
    dlogits = ((p - onehot) * (g / R)).astype(logits.dtype)
    dx2 = jax.lax.dot_general(dlogits, wte_p.astype(dlogits.dtype),
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32
                              ).astype(lnf.dtype)
    x2 = lnf.reshape(-1, C)
    dw = jax.lax.dot_general(dlogits, x2.astype(dlogits.dtype),
                             (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(wte_p.dtype)
    return dx2.reshape(lnf.shape), dw, None


head_ce_mean.defvjp(_fwd, _bwd)
