"""Fused qkv-projection + flash attention (custom VJP).

Composing `linear` and `flash_attention_qkv` separately forces the attention
VJP to hand back a packed (B, T, 3C) gradient, which XLA materializes as a
ragged-dim concatenate of dq|dk|dv — measured at ~12 ms/step of pure
dynamic-update-slice traffic at ViT-B/16 B=64.  Fusing the projection into
the attention VJP dissolves it: the backward keeps dq/dk/dv as the three
separate arrays the Pallas kernels naturally produce and feeds them straight
into the projection gradients,

    dln1  = dq·W_q + dk·W_k + dv·W_v          (same FLOPs as dqkv·W)
    dW_*  = d*ᵀ · ln1     dqkvb = Σ d*

with only the (3C, C) *weight* gradient assembled by concatenation (7 MB,
once per layer, vs 58 MB of activations).

Forward is unchanged: ONE packed MXU matmul from the canonical (3C, C)
weight (rusty_vit.rs:323), then the flash kernel reading the packed layout
in place.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import basic
from . import flash_attention as FA


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def qkv_attention(ln1: jax.Array, qkvw: jax.Array, qkvb: jax.Array,
                  num_heads: int, causal: bool = False,
                  interpret: bool = False, window: int = 0) -> jax.Array:
    """(B, T, C) -> (B, T, C): packed qkv projection + multi-head attention.
    window > 0 (causal) = sliding-window attention."""
    out, _ = _fwd(ln1, qkvw, qkvb, num_heads, causal, interpret, window)
    return out


def _fwd(ln1, qkvw, qkvb, num_heads, causal, interpret, window=0):
    C = ln1.shape[-1]
    D = C // num_heads
    # odd head counts run with zero-padded phantom heads (GPT-2 1.5B: 25
    # heads -> 26); the projection weight is padded per-third so the packed
    # phantom layout comes straight off the MXU (FA.pad_qkv_weight)
    H = FA.padded_num_heads(num_heads, D)
    assert H is not None, (
        f"geometry (heads={num_heads}, head_dim={D}) not tileable by the "
        "packed flash kernel — use the plain composition path")
    w_run, b_run = FA.pad_qkv_weight(qkvw, qkvb, num_heads, H, D)
    qkv = basic.linear(ln1, w_run, b_run)
    B, T, _ = qkv.shape
    sm_scale = 1.0 / (D ** 0.5)
    qkv_k, bq, bk = FA.prep_blocks(qkv, FA.DEFAULT_BLOCK_Q, FA.DEFAULT_BLOCK_K)
    out, lse = FA._fwd(qkv_k, H, sm_scale, causal, T, bq, bk, interpret,
                       window)
    T_pad = qkv_k.shape[1]
    out_t = out[:, :T, :] if T_pad != T else out
    if H != num_heads:
        out_t = out_t[:, :, :C]
    return out_t, (ln1, qkvw, qkv_k, out, lse, sm_scale, T, bq, bk, H)


def _qkv_attention_fwd(ln1, qkvw, qkvb, num_heads, causal, interpret,
                       window=0):
    out, res = _fwd(ln1, qkvw, qkvb, num_heads, causal, interpret, window)
    return out, res


def qkv_projection_bwd(dq, dk, dv, ln1, qkvw):
    """Backward of the packed qkv projection y = ln1·[Wq|Wk|Wv]ᵀ + b given
    per-part output grads: returns (dln1, dqkvw, dqkvb).  Shared by this
    fused op's VJP and the selective-remat attention branch
    (models/selective._attn_branch_bwd) — one decomposition, two callers.
    Part widths come from the grads themselves (dk/dv are kv_dim < C wide
    under GQA), so the same decomposition serves MHA and GQA weights."""
    C = ln1.shape[-1]
    Cq, Ck = dq.shape[-1], dk.shape[-1]
    Wq, Wk, Wv = qkvw[:Cq], qkvw[Cq:Cq + Ck], qkvw[Cq + Ck:]
    # y = x·Wᵀ  =>  dx = Σ dy_part · W_part
    dln1 = (basic.linear(dq, Wq.T) + basic.linear(dk, Wk.T)
            + basic.linear(dv, Wv.T))
    # dW_part = dy_partᵀ · x
    def dW(g):
        return jax.lax.dot_general(
            g.reshape(-1, g.shape[-1]), ln1.reshape(-1, C),
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dqkvw = jnp.concatenate([dW(dq), dW(dk), dW(dv)], axis=0).astype(qkvw.dtype)
    red = tuple(range(dq.ndim - 1))
    dqkvb = jnp.concatenate([
        jnp.sum(dq.astype(jnp.float32), axis=red),
        jnp.sum(dk.astype(jnp.float32), axis=red),
        jnp.sum(dv.astype(jnp.float32), axis=red)]).astype(qkvw.dtype)
    return dln1, dqkvw, dqkvb


def _qkv_attention_bwd(num_heads, causal, interpret, window, res, do):
    ln1, qkvw, qkv_k, out, lse, sm_scale, T, bq, bk, H = res
    C = ln1.shape[-1]
    Cp = qkv_k.shape[-1] // 3
    T_pad = qkv_k.shape[1]
    if Cp != C:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, Cp - C)))
    do_k = jnp.pad(do, ((0, 0), (0, T_pad - T), (0, 0))) if T_pad != T else do
    dq, dk, dv = FA._bwd_parts(qkv_k, H, out, lse, do_k, sm_scale,
                               causal, T, bq, bk, interpret, window)
    dq, dk, dv = (g[:, :T, :C] for g in (dq, dk, dv))
    dln1, dqkvw, dqkvb = qkv_projection_bwd(dq, dk, dv, ln1, qkvw)
    return dln1.astype(ln1.dtype), dqkvw, dqkvb


qkv_attention.defvjp(_qkv_attention_fwd, _qkv_attention_bwd)
