"""Adafactor — sublinear-memory optimizer (Shazeer & Stern 2018).

The reference's optimizer story is SGD with dormant AdamW moments
(train_vit.rs:73-74, gap G7); this framework ships fused AdamW as the
production default (ops/fused_adamw.py).  Adafactor is the TPU-era
alternative for when the OPTIMIZER STATE is the memory wall: instead of a
full second moment v (one fp32 copy of every parameter), matrix-shaped
parameters keep only per-row and per-column EMAs of g² — O(n+m) instead of
O(n·m).  At GPT-2 1.5B that collapses 6.2 GB of m/v (bf16) to ~3 MB of
factored state, freeing HBM for batch (the measured single-chip 1.5B row
in BASELINE.md is state-bound, not weight-bound).

Implementation notes (the standard formulation):
  * beta2 schedule: β2_t = 1 − t^−0.8 — debiasing-free (the paper's decay).
  * factored v̂ = (R ⊗ C) / mean(R): R row-EMA, C col-EMA of g² + eps1.
    A leaf factors only when BOTH trailing dims reach MIN_FACTOR (=128, the
    optax/T5X `min_dim_size_to_factor` convention) — true weight matrices
    factor, while biases/LN stacks like (L, 4C) or (L, E, 4C) keep a full
    elementwise v (rank-factoring across a stack axis is not a meaningful
    low-rank structure, and elementwise v is what makes the expert-parallel
    step exactly invariant to sharding the E axis).  Stacked layouts —
    (L, OC, IC) blocks and (L, E, OC, IC) expert slabs — factor over the
    LAST TWO dims, keeping the leading stack axes (each layer/expert matrix
    is its own factorization, exactly the per-matrix semantics).
  * update clipping: u ← u / max(1, RMS(u)/d) with d = 1.0 — the paper's
    replacement for global grad-norm clipping, applied per PARAMETER in the
    paper's sense: per trailing matrix for factored leaves, per trailing
    vector for non-factored ndim≥2 stacks, whole-tensor for true vectors.
    (Also the property that makes the step invariant to leading-axis
    sharding — the expert-parallel Adafactor mode depends on it.)
  * relative step size (optional, on by default like the paper): the
    caller's lr is multiplied by max(RMS(param), eps2) so one scalar works
    across embedding/matrix scales; RMS(param) at the same granularity as
    the clip.
  * first moment: OFF by default (the memory-saving configuration); set
    beta1 > 0 for momentum at one param-copy of extra state.
  * decoupled weight decay, masked to matrix-shaped leaves by the caller
    (ops/optimizer.decay_mask_2d — the llm.c policy).

All state is fp32; the update math never runs below fp32.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

EPS1 = 1e-30     # inside-sqrt regularizer on g²
EPS2 = 1e-3      # RMS(param) floor for the relative step size
CLIP_D = 1.0
MIN_FACTOR = 128  # min trailing-dim size to rank-factor (optax convention)


class AdafactorState(NamedTuple):
    """Pytrees mirroring the params: vr/vc factored rows/cols (zeros-shaped
    (…, OC) / (…, IC) for ndim≥2 leaves), vf full second moment for vectors
    (zeros for factored leaves — kept shape-stable so the state is a plain
    pytree for checkpointing), m first moment (empty dict when beta1=0)."""
    vr: Dict[str, jax.Array]
    vc: Dict[str, jax.Array]
    vf: Dict[str, jax.Array]
    m: Dict[str, jax.Array]


def _factored(p: jax.Array, min_factor: int = MIN_FACTOR) -> bool:
    return p.ndim >= 2 and min(p.shape[-2:]) >= min_factor


def init_state(params: Dict[str, jax.Array], beta1: float = 0.0,
               min_factor: int = MIN_FACTOR) -> AdafactorState:
    vr, vc, vf = {}, {}, {}
    for k, p in params.items():
        if _factored(p, min_factor):
            vr[k] = jnp.zeros(p.shape[:-1], jnp.float32)       # (…, OC)
            vc[k] = jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
            vf[k] = jnp.zeros((), jnp.float32)
        else:
            vr[k] = jnp.zeros((), jnp.float32)
            vc[k] = jnp.zeros((), jnp.float32)
            vf[k] = jnp.zeros(p.shape, jnp.float32)
    m = ({k: jnp.zeros(p.shape, jnp.float32) for k, p in params.items()}
         if beta1 > 0.0 else {})
    return AdafactorState(vr, vc, vf, m)


def _rms(x: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.mean(jnp.square(x)))


def step(params: Dict[str, jax.Array], grads: Dict[str, jax.Array],
         state: AdafactorState, t: jax.Array, lr,
         beta1: float = 0.0, weight_decay: float = 0.0,
         decay_mask: Optional[Dict[str, bool]] = None,
         relative_step: bool = True, min_factor: int = MIN_FACTOR):
    """One Adafactor step over the parameter pytree.

    t is the 1-based step count (drives the β2 schedule); lr is the
    caller's schedule value (multiplied by RMS(param) when relative_step).
    Returns (new_params, new_state).
    """
    tf = jnp.maximum(t.astype(jnp.float32), 1.0)
    beta2 = 1.0 - tf ** -0.8
    new_p, new_vr, new_vc, new_vf, new_m = {}, {}, {}, {}, {}
    for k, p in params.items():
        g = grads[k].astype(jnp.float32)
        g2 = jnp.square(g) + EPS1
        if _factored(p, min_factor):
            vr = beta2 * state.vr[k] + (1.0 - beta2) * jnp.mean(g2, axis=-1)
            vc = beta2 * state.vc[k] + (1.0 - beta2) * jnp.mean(g2, axis=-2)
            # v̂ = outer(vr, vc) / mean(vr) per trailing matrix
            denom = jnp.maximum(jnp.mean(vr, axis=-1, keepdims=True), EPS1)
            u = g * jax.lax.rsqrt(vr / denom)[..., None] \
                  * jax.lax.rsqrt(vc)[..., None, :]
            new_vr[k], new_vc[k] = vr, vc
            new_vf[k] = state.vf[k]
            # RMS scalars (update clip, relative step size) are PER TRAILING
            # MATRIX, the paper's unit of clipping (each weight matrix is
            # its own parameter there) — which also makes the step exactly
            # invariant to sharding stacked leaves on their leading batch
            # dims (the expert-parallel Adafactor mode relies on this:
            # every (L, E)-indexed matrix sees identical scalars whether it
            # lives on one device or an "expert" shard)
            rms_u = jnp.sqrt(jnp.mean(jnp.square(u), axis=(-2, -1),
                                      keepdims=True))
        else:
            vf = beta2 * state.vf[k] + (1.0 - beta2) * g2
            u = g * jax.lax.rsqrt(vf)
            new_vf[k] = vf
            new_vr[k], new_vc[k] = state.vr[k], state.vc[k]
            # per trailing VECTOR for stacked bias/LN leaves (each (l[, e])
            # slice is its own parameter), whole-tensor for true vectors
            rms_u = (jnp.sqrt(jnp.mean(jnp.square(u), axis=-1,
                                       keepdims=True))
                     if p.ndim >= 2 else _rms(u))
        u = u / jnp.maximum(1.0, rms_u / CLIP_D)
        if beta1 > 0.0:
            mu = beta1 * state.m[k] + (1.0 - beta1) * u
            new_m[k] = mu
            u = mu
        pf = p.astype(jnp.float32)
        if relative_step:
            if _factored(p, min_factor):
                rms_p = jnp.sqrt(jnp.mean(jnp.square(pf), axis=(-2, -1),
                                          keepdims=True))
            elif p.ndim >= 2:
                rms_p = jnp.sqrt(jnp.mean(jnp.square(pf), axis=-1,
                                          keepdims=True))
            else:
                rms_p = _rms(pf)
            alpha = lr * jnp.maximum(rms_p, EPS2)
        else:
            alpha = lr
        wd = weight_decay if (decay_mask is None or decay_mask[k]) else 0.0
        pf = pf - alpha * u - lr * wd * pf
        new_p[k] = pf.astype(p.dtype)
    return new_p, AdafactorState(new_vr, new_vc, new_vf, new_m)


def state_bytes(state: AdafactorState) -> int:
    """Total optimizer-state footprint (the point of Adafactor)."""
    return sum(a.size * a.dtype.itemsize
               for tree in state
               for a in jax.tree_util.tree_leaves(tree))
