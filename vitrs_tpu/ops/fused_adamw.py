"""Fused AdamW Pallas kernel over the flat parameter vector.

The reference allocates AdamW moment buffers but ships plain SGD
(train_vit.rs:73-74 vs 737-743, gap G7).  This kernel is the intended
optimizer, fused: one pass over HBM reading (p, g, m, v) and writing
(p, m, v) in place — 7 f32 streams total, purely HBM-bandwidth-bound,
with the bias-corrected decoupled-weight-decay update on the VPU.

The flat vector is padded to a (rows, 128) layout and the grid walks row
blocks; input/output aliasing makes the update in-place so no extra HBM
allocation happens at 124M+ parameters.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
BLOCK_ROWS = 1024          # 1024x128 f32 = 512 KiB per stream; 7 streams < 4 MiB VMEM


def _adamw_kernel(scalars_ref, p_ref, g_ref, m_ref, v_ref,
                  p_out, m_out, v_out, *, beta1, beta2, eps):
    t = scalars_ref[0]          # step (as f32)
    lr = scalars_ref[1]
    weight_decay = scalars_ref[2]
    g = g_ref[:]
    m = beta1 * m_ref[:] + (1.0 - beta1) * g
    v = beta2 * v_ref[:] + (1.0 - beta2) * g * g
    # beta^t via exp(t*log(beta)); log(beta) folded at trace time
    bc1 = 1.0 - jnp.exp(t * math.log(beta1))
    bc2 = 1.0 - jnp.exp(t * math.log(beta2))
    mhat = m / bc1
    vhat = v / bc2
    p = p_ref[:]
    p_out[:] = p - lr * (mhat / (jnp.sqrt(vhat) + eps) + weight_decay * p)
    m_out[:] = m
    v_out[:] = v


@functools.partial(jax.jit, static_argnames=("beta1", "beta2", "eps",
                                             "interpret"))
def adamw_pallas(p, g, m, v, step, lr, beta1=0.9, beta2=0.999, eps=1e-8,
                 weight_decay=0.0, interpret=False):
    n = p.shape[0]
    chunk = BLOCK_ROWS * LANES
    n_pad = ((n + chunk - 1) // chunk) * chunk
    pad = n_pad - n

    def shape2d(x):
        x = jnp.pad(x, (0, pad))
        return x.reshape(-1, LANES)

    p2, g2, m2, v2 = shape2d(p), shape2d(g.astype(jnp.float32)), shape2d(m), shape2d(v)
    rows = p2.shape[0]
    grid = (rows // BLOCK_ROWS,)
    scalars = jnp.stack([jnp.asarray(step, jnp.float32),
                         jnp.asarray(lr, jnp.float32),
                         jnp.asarray(weight_decay, jnp.float32)])

    kern = functools.partial(_adamw_kernel, beta1=beta1, beta2=beta2, eps=eps)
    blk = pl.BlockSpec((BLOCK_ROWS, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    p_new, m_new, v_new = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk, blk, blk, blk],
        out_specs=(blk, blk, blk),
        out_shape=(out_shape, out_shape, out_shape),
        input_output_aliases={1: 0, 3: 1, 4: 2},   # p, m, v updated in place
        cost_estimate=pl.CostEstimate(
            flops=12 * n_pad, bytes_accessed=7 * 4 * n_pad, transcendentals=2),
        interpret=interpret,
    )(scalars, p2, g2, m2, v2)
    return (p_new.reshape(-1)[:n], m_new.reshape(-1)[:n], v_new.reshape(-1)[:n])
