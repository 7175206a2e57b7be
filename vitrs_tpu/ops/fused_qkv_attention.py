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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def qkv_attention(ln1: jax.Array, qkvw: jax.Array, qkvb: jax.Array,
                  num_heads: int, causal: bool = False,
                  interpret: bool = False, window: int = 0,
                  rope: bool = False, kv_heads: int = 0) -> jax.Array:
    """(B, T, C) -> (B, T, C): packed qkv projection + multi-head attention.
    window > 0 (causal) = sliding-window attention.  rope=True applies
    rotary embeddings INSIDE the flash kernels (tiles already in VMEM,
    cos/sin recomputed from iota on the VPU; dq/dk inverse-rotated in the
    kernel flush epilogues — R is orthogonal) — replacing the ~42 ms/step
    of full-width apply_rope HBM passes + packed concats this op used to
    spend at GPT-2 124M B=32.  kv_heads > 0 (GQA/MQA) projects with the
    SMALL (C + 2*kv_dim, C) weight and expands K/V on the activations
    before the kernel; the backward group-sums dk/dv back to kv_dim.
    Measured both ways at GPT-2 124M MQA(kv=4): the small projection saves
    ~17 ms/step of MXU over projecting with group-expanded (3C, C) weights
    — the qkv projection is ~25% of block matmul FLOPs and GQA cuts it
    44% — which beats the ~8 ms the expanded-weight form saved in
    activation HBM traffic.  (Weight-level expansion lives on in
    ops/attention.expand_qkv_weight for the dense fallback and TP paths.)
    Rope rotation is per-head IDENTICAL (angles depend only on position and
    D), so it commutes with both the group expansion and the backward
    group sum — k rotates at kv_dim width, dk group-sums then
    inverse-rotates at kv_dim width."""
    out, _ = _fwd(ln1, qkvw, qkvb, num_heads, causal, interpret, window,
                  rope, kv_heads)
    return out


def _fwd(ln1, qkvw, qkvb, num_heads, causal, interpret, window=0,
         rope=False, kv_heads=0):
    C = ln1.shape[-1]
    D = C // num_heads
    # odd head counts run with zero-padded phantom heads (GPT-2 1.5B: 25
    # heads -> 26); the projection weight is padded per-third so the packed
    # phantom layout comes straight off the MXU (FA.pad_qkv_weight)
    H = FA.padded_num_heads(num_heads, D)
    assert H is not None, (
        f"geometry (heads={num_heads}, head_dim={D}) not tileable by the "
        "packed flash kernel — use the plain composition path")
    gqa = bool(kv_heads) and kv_heads != num_heads
    if gqa:
        from . import flash_attention_gqa as FG
        if FG.supports_gqa(num_heads, kv_heads, D):
            # GQA-NATIVE kernels: the small projection emits the GQA-packed
            # layout (k/v thirds at kv width, zero-padded to 128-lane
            # blocks) and the kernel shares each KV head across its query
            # group in VMEM — no activation expansion, no expanded weights,
            # rope at small width.  supports_gqa implies C is lane-aligned,
            # so H == num_heads here.
            assert H == num_heads
            # rope happens INSIDE the kernels (FA._rope_rotate): the
            # projection emits unrotated activations, the kernels rotate
            # tiles already in VMEM, and dq/dk come back inverse-rotated —
            # no full-width rotation passes or packed concats in HBM
            qkv = FG.project_gqa_packed(ln1, qkvw, qkvb, num_heads,
                                        kv_heads, D, rope=False)
            B, T, _ = qkv.shape
            sm_scale = 1.0 / (D ** 0.5)
            bq0, bk0 = FG.gqa_blocks(num_heads, kv_heads, D)
            qkv_k, bq, bk = FA.prep_blocks(qkv, bq0, bk0)
            out, lse = FG._fwd(qkv_k, num_heads, kv_heads, D, sm_scale,
                               causal, T, bq, bk, interpret, window,
                               rope=rope)
            T_pad = qkv_k.shape[1]
            out_t = out[:, :T, :] if T_pad != T else out
            return out_t, (ln1, qkvw, qkv_k, out, lse, sm_scale, T, bq, bk,
                           H)
    if gqa and not rope:
        # group-expanded weights: ride the whole MHA path (see docstring)
        from .attention import expand_qkv_weight
        w_mha, b_mha = expand_qkv_weight(qkvw, qkvb, num_heads, kv_heads)
        w_run, b_run = FA.pad_qkv_weight(w_mha, b_mha, num_heads, H, D)
        qkv = basic.linear(ln1, w_run, b_run)
        B, T, _ = qkv.shape
    elif gqa:
        # rope, non-native geometry: SMALL projection, expand K/V
        # activations to full heads for the MHA-packed kernel — the kernel
        # rotates in-VMEM (rotation is per-head identical, so it commutes
        # with the group duplication)
        qkv_s = basic.linear(ln1, qkvw, qkvb)
        B, T, _ = qkv_s.shape
        from .attention import expand_packed
        qkv = expand_packed(qkv_s, num_heads, kv_heads)
        if H != num_heads:
            Cp = H * D
            pad = jnp.zeros((B, T, Cp - C), qkv.dtype)
            qkv = jnp.concatenate(
                [t for i in range(3)
                 for t in (qkv[:, :, i * C:(i + 1) * C], pad)], axis=-1)
    else:
        w_run, b_run = FA.pad_qkv_weight(qkvw, qkvb, num_heads, H, D)
        qkv = basic.linear(ln1, w_run, b_run)
        B, T, _ = qkv.shape
    sm_scale = 1.0 / (D ** 0.5)
    qkv_k, bq, bk = FA.prep_blocks(qkv, FA.DEFAULT_BLOCK_Q, FA.DEFAULT_BLOCK_K)
    # rope rotation (phantom heads' zero lanes rotate to zeros) lives in the
    # kernels — see flash_attention._rope_rotate
    out, lse = FA._fwd(qkv_k, H, sm_scale, causal, T, bq, bk, interpret,
                       window, rope=rope)
    T_pad = qkv_k.shape[1]
    out_t = out[:, :T, :] if T_pad != T else out
    if H != num_heads:
        out_t = out_t[:, :, :C]
    return out_t, (ln1, qkvw, qkv_k, out, lse, sm_scale, T, bq, bk, H)


def _qkv_attention_fwd(ln1, qkvw, qkvb, num_heads, causal, interpret,
                       window=0, rope=False, kv_heads=0):
    out, res = _fwd(ln1, qkvw, qkvb, num_heads, causal, interpret, window,
                    rope, kv_heads)
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


def _qkv_attention_bwd(num_heads, causal, interpret, window, rope, kv_heads,
                       res, do):
    ln1, qkvw, qkv_k, out, lse, sm_scale, T, bq, bk, H = res
    C = ln1.shape[-1]
    gqa = bool(kv_heads) and kv_heads != num_heads
    if gqa:
        from . import flash_attention_gqa as FG
        D_ = C // num_heads
        if FG.supports_gqa(num_heads, kv_heads, D_):
            # GQA-native backward: dk/dv come back at kv width, already
            # group-summed per KV head in kernel — straight into the small
            # projection backward; rope's inverse rotation happened in the
            # kernels' flush epilogues
            T_pad = qkv_k.shape[1]
            do_k = (jnp.pad(do, ((0, 0), (0, T_pad - T), (0, 0)))
                    if T_pad != T else do)
            dq, dk, dv = FG._bwd_parts(qkv_k, num_heads, kv_heads, D_, out,
                                       lse, do_k, sm_scale, causal, T, bq,
                                       bk, interpret, window, rope=rope)
            kvd = kv_heads * D_
            dq = dq[:, :T]
            dk, dv = dk[:, :T, :kvd], dv[:, :T, :kvd]
            dln1, dqkvw, dqkvb = qkv_projection_bwd(dq, dk, dv, ln1, qkvw)
            return dln1.astype(ln1.dtype), dqkvw, dqkvb
    Cp = qkv_k.shape[-1] // 3
    T_pad = qkv_k.shape[1]
    if Cp != C:
        do = jnp.pad(do, ((0, 0), (0, 0), (0, Cp - C)))
    do_k = jnp.pad(do, ((0, 0), (0, T_pad - T), (0, 0))) if T_pad != T else do
    dq, dk, dv = FA._bwd_parts(qkv_k, H, out, lse, do_k, sm_scale,
                               causal, T, bq, bk, interpret, window,
                               rope=rope)
    dq, dk, dv = (g[:, :T, :C] for g in (dq, dk, dv))
    gqa = bool(kv_heads) and kv_heads != num_heads
    if gqa and not rope:
        # expanded-weight form: projection backward against the expanded
        # weight, then a WEIGHT-sized per-group row sum
        from .attention import expand_qkv_weight, reduce_qkv_weight_grad
        w_mha, _ = expand_qkv_weight(qkvw, None, num_heads, kv_heads)
        dln1, dwe, dbe = qkv_projection_bwd(dq, dk, dv, ln1, w_mha)
        dqkvw, dqkvb = reduce_qkv_weight_grad(dwe, dbe, num_heads, kv_heads)
        return dln1.astype(ln1.dtype), dqkvw, dqkvb
    if gqa:
        # non-native rope geometry: dq/dk came back inverse-rotated from the
        # kernels; group-sum dk/dv to kv_dim for the SMALL weight (the
        # per-head-identical rotation commutes with the group sum) —
        # qkv_projection_bwd reads part widths from the grads themselves
        B = dk.shape[0]
        G = num_heads // kv_heads
        D_ = C // num_heads
        dk = dk.reshape(B, T, kv_heads, G, D_).sum(axis=3).reshape(
            B, T, kv_heads * D_)
        dv = dv.reshape(B, T, kv_heads, G, D_).sum(axis=3).reshape(
            B, T, kv_heads * D_)
    dln1, dqkvw, dqkvb = qkv_projection_bwd(dq, dk, dv, ln1, qkvw)
    return dln1.astype(ln1.dtype), dqkvw, dqkvb


qkv_attention.defvjp(_qkv_attention_fwd, _qkv_attention_bwd)
