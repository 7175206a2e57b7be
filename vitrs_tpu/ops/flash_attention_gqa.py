"""GQA/MQA-native Pallas flash attention — K/V at kv_dim width end to end.

The packed MHA kernels (ops/flash_attention.py) serve GQA by EXPANDING K/V
to the full query-head count first — either on the activations (measured
~45 ms/step of repeat/concat + backward segment-sum at GPT-2 124M kv=4
B=32) or via group-expanded projection weights (~17 ms/step of extra MXU:
the qkv projection is ~25 % of block matmul FLOPs and GQA cuts it 44 %,
fused_qkv_attention.py docstring).  This module removes the trade entirely:
the kernels read the SMALL K/V directly and share each KV head across its
query group inside VMEM.

Layout ("GQA-packed"): qkv (B, T, C + 2·kvd_pad) = q | k | v with
q at channels [0, C) exactly as the MHA packed layout, and the k/v thirds
at kv width, zero-padded up to kvd_pad = n_kvblk·128 lanes (padding only
when kv_heads·D < 128, e.g. MQA at D=64).  `pad_gqa_weight` zero-pads the
projection weight rows so the projection emits this layout straight off the
MXU — no activation relayout anywhere.

Grid: the head axis enumerates KV BLOCKS (the KVB = 128//D kv heads of one
128-lane block) instead of query head-groups.  Each cell owns one K/V block
plus ALL of its QH = R·KVB query heads (R = num_heads//kv_heads), looping
the q heads in chunks with the same phase-split schedule as the MHA kernels
(all MXU dots, then all VPU softmax work, then all output dots) — chunked so
the per-phase (block_q, block_k) f32 intermediates stay within the VMEM
budget the MHA kernels were tuned to.  Every q-head -> kv-slice offset,
(g // R)·D, is a static Python int: no dynamic lane slicing.

Backward: dk/dv accumulate PER KV HEAD in kernel scratch — the sum over the
R query heads of a group happens where the tiles already live, so the
(B, T, C)-wide dk/dv arrays and the XLA segment-sum of the expansion path
never exist.  dq is per-query-head as usual.

Reference anchor: the reference has a single fixed head count
(rusty_vit.rs:520-555, one head loop over C = NH·D channels); GQA/MQA is a
beyond-reference model variant, so parity is defined against this repo's own
expansion path (ops/attention.expand_packed), which these kernels must match
bitwise-modulo-float-association (tests/test_flash_gqa.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import (LANES, MASK_VALUE, _mask, _no_tab,
                              _rope_rotate, _rope_tab_spec, _rope_table,
                              _sems, _tile_overlaps_band, _band_crosses_tile)

# Combined single-pass backward admission budget (bytes of estimated
# per-cell VMEM, see _bwd_parts).  13 MB leaves ~3 MB of the 16 MB scoped
# stack for Mosaic's own spills; GPT-2 124M kv=4 (QH=6, T=1024) estimates
# 14.3 MB and takes the dKV/dQ pair.  Module-level so tests force either
# path.
COMBINED_GQA_BUDGET = 13 << 20


def supports_gqa(num_heads: int, kv_heads: int, head_dim: int) -> bool:
    """Whether the GQA-native kernels can tile this geometry.  Requires a
    real group structure (R >= 2), lane-divisible head_dim, and kv heads
    that fill 128-lane blocks exactly — or fewer than one block's worth
    (MQA-style), which runs as a single zero-padded block."""
    if not kv_heads or kv_heads == num_heads:
        return False
    if head_dim > LANES or LANES % head_dim:
        return False
    if num_heads % kv_heads:
        return False
    kvb = LANES // head_dim
    if kv_heads >= kvb and kv_heads % kvb:
        return False
    if (num_heads * head_dim) % LANES:
        return False
    return True


def _geom(num_heads: int, kv_heads: int, head_dim: int):
    """(QH, R, KVB, n_kvblk, C, kvd, kvd_pad) for a supported geometry."""
    D = head_dim
    KVB = LANES // D                       # kv heads per 128-lane block
    R = num_heads // kv_heads
    if kv_heads < KVB:                     # one partially-phantom block
        n_kvblk = 1
    else:
        n_kvblk = kv_heads // KVB
    QH = num_heads // n_kvblk              # query heads per grid cell
    C = num_heads * D
    kvd = kv_heads * D
    kvd_pad = n_kvblk * LANES
    return QH, R, KVB, n_kvblk, C, kvd, kvd_pad


def kvd_padded(kv_heads: int, head_dim: int) -> int:
    """HBM width of each padded K/V third (= kv_dim rounded up to 128)."""
    kvb = LANES // head_dim
    n = 1 if kv_heads < kvb else kv_heads // kvb
    return n * LANES


def pad_gqa_weight(qkvw: jax.Array, qkvb, num_heads: int, kv_heads: int,
                   head_dim: int):
    """Zero-pad the small packed (C + 2·kvd, IC) projection weight's k/v
    thirds to kvd_pad rows each, so the projection emits the GQA-packed
    phantom-lane layout directly (mirror of flash_attention.pad_qkv_weight
    for the GQA layout; no-op when kvd is already 128-aligned)."""
    C = num_heads * head_dim
    kvd = kv_heads * head_dim
    kp = kvd_padded(kv_heads, head_dim)
    if kp == kvd:
        return qkvw, qkvb
    q, k, v = qkvw[:C], qkvw[C:C + kvd], qkvw[C + kvd:]
    pad = jnp.zeros((kp - kvd, qkvw.shape[1]), qkvw.dtype)
    w = jnp.concatenate([q, k, pad, v, pad], axis=0)
    b = None
    if qkvb is not None:
        bq, bk, bv = qkvb[:C], qkvb[C:C + kvd], qkvb[C + kvd:]
        bpad = jnp.zeros((kp - kvd,), qkvb.dtype)
        b = jnp.concatenate([bq, bk, bpad, bv, bpad])
    return w, b


def project_gqa_packed(ln1: jax.Array, qkvw: jax.Array, qkvb,
                       num_heads: int, kv_heads: int, head_dim: int,
                       rope: bool = False) -> jax.Array:
    """Small qkv projection emitting the GQA-packed layout straight off the
    MXU (phantom lanes from zero weight rows), with optional rope rotation
    at small width — q rotates at C, k at kv_dim (phantom k lanes stay
    zero).  Shared by the fused projection+attention op and the selective
    remat attention branch (recomputed there in backward)."""
    from . import basic
    w_run, b_run = pad_gqa_weight(qkvw, qkvb, num_heads, kv_heads, head_dim)
    qkv = basic.linear(ln1, w_run, b_run)
    if rope:
        from .rope import apply_rope
        C = num_heads * head_dim
        kvd = kv_heads * head_dim
        pos = jnp.arange(qkv.shape[1])
        qkv = jnp.concatenate(
            [apply_rope(qkv[..., :C], pos, num_heads),
             apply_rope(qkv[..., C:C + kvd], pos, kv_heads),
             qkv[..., C + kvd:]], axis=-1)
    return qkv


def gqa_blocks(num_heads: int, kv_heads: int, head_dim: int):
    """Block sizes for the GQA grid: cells with many query heads (MQA at
    12 heads: QH = 12) shrink the tile so the QH-scaled lse/scratch and the
    chunked per-phase intermediates stay inside VMEM."""
    QH = _geom(num_heads, kv_heads, head_dim)[0]
    # MQA at 512 blocks under the 32 MB stack measured neutral (142.0 vs
    # 142.1k tok/s at GPT-2 kv=1 B=32) — 256 stays
    b = 512 if QH <= 6 else 256
    return b, b


def _chunks(QH: int, chunk: int):
    return [range(c, min(c + chunk, QH)) for c in range(0, QH, chunk)]


GQA_VMEM_LIMIT = 32 << 20    # multi-tile fwd scoped stack (see _fwd_chunk)


def _fwd_chunk(QH: int, block: int) -> int:
    """Forward head-chunk size: min(6, QH) — under the 32 MB scoped-vmem
    stack (GQA_VMEM_LIMIT; the 16 MB Mosaic default is a knob, not
    hardware) the whole QH=6 query group runs as ONE phase-split chunk.
    Measured at GPT-2 124M kv=4 B=32: 148.7k tok/s vs 144.9k at the old
    chunk 3 (which existed only because chunk 4 measured 312 KB over the
    16 MB stack); +rope 144.4k vs 140.9k.  GQA now beats MHA (145.1k)
    outright.  Neutral negatives: chunk 12 at the MQA/256-block shape
    (141.8k vs 142.1k), backward chunk 6 (148.0k vs 148.7k at default)."""
    return min(6, QH)


def _bwd_chunk(QH: int, block: int) -> int:
    """Backward head-chunk: 4 per-phase lists coexist (ss/dps/ps/dss), so
    half the forward's chunk at big blocks."""
    if block < 512:
        return min(4, QH)
    return min(2, QH)


# ---------------------------------------------------------------------------
# single-tile fast path (T fits one block)
# ---------------------------------------------------------------------------

def _fwd_single_kernel(q_ref, k_ref, v_ref, tab_ref, o_ref, lse_ref,
                       *, sm_scale, causal, seq_len, T, QH, R, D, chunk,
                       window=0, rope=False):
    qf, kf, vf = q_ref[0], k_ref[0], v_ref[0]
    if rope:
        # phantom K lanes (kv_heads·D < 128) hold zeros and the rotation
        # only mixes lanes within one D-lane head — they stay zero
        tab = tab_ref[:]
        qf = _rope_rotate(qf, tab, D).astype(qf.dtype)
        kf = _rope_rotate(kf, tab, D).astype(kf.dtype)
    need_mask = causal or seq_len != T
    if need_mask:
        msk = _mask((T, T), 0, 0, T, T, causal, seq_len, window)
    outs = [None] * QH
    for hs in _chunks(QH, chunk):
        # phase-split within the chunk (see flash_attention._fwd_single_kernel)
        ss = []
        for g in hs:
            kv = slice((g // R) * D, (g // R + 1) * D)
            q = (qf[:, g * D:(g + 1) * D].astype(jnp.float32)
                 * sm_scale).astype(qf.dtype)
            ss.append(jax.lax.dot_general(q, kf[:, kv],
                                          (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32))
        ps, invs = [], []
        for i, g in enumerate(hs):
            s = jnp.where(msk, ss[i], MASK_VALUE) if need_mask else ss[i]
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            ps.append(p)
            invs.append(jnp.where(l == 0.0, 0.0, 1.0 / l))
            lse = jnp.where(l == 0.0, MASK_VALUE,
                            m + jnp.log(jnp.maximum(l, 1e-38)))
            lse_ref[0, g] = jnp.broadcast_to(lse, lse_ref.shape[2:])
        for i, g in enumerate(hs):
            kv = slice((g // R) * D, (g // R + 1) * D)
            pv = jax.lax.dot_general(ps[i].astype(vf.dtype), vf[:, kv],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            outs[g] = pv * invs[i]
    o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _bwd_single_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, tab_ref,
                       dq_ref, dk_ref, dv_ref,
                       *, sm_scale, causal, seq_len, T, QH, R, D, KVB, chunk,
                       window=0, rope=False):
    qf, kf, vf = q_ref[0], k_ref[0], v_ref[0]
    if rope:
        tab = tab_ref[:]
        qf = _rope_rotate(qf, tab, D).astype(qf.dtype)
        kf = _rope_rotate(kf, tab, D).astype(kf.dtype)
    of, dof = o_ref[0], do_ref[0]
    need_mask = causal or seq_len != T
    if need_mask:
        msk = _mask((T, T), 0, 0, T, T, causal, seq_len, window)
    dqs = [None] * QH
    dk_acc = [None] * KVB
    dv_acc = [None] * KVB
    for hs in _chunks(QH, chunk):
        ss, dps = [], []
        for g in hs:
            kv = slice((g // R) * D, (g // R + 1) * D)
            sl = slice(g * D, (g + 1) * D)
            ss.append(jax.lax.dot_general(
                qf[:, sl], kf[:, kv], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
            dps.append(jax.lax.dot_general(
                dof[:, sl], vf[:, kv], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        ps, dss = [], []
        for i, g in enumerate(hs):
            sl = slice(g * D, (g + 1) * D)
            lse = lse_ref[0, g][:, :1]
            di = jnp.sum(of[:, sl].astype(jnp.float32)
                         * dof[:, sl].astype(jnp.float32),
                         axis=1, keepdims=True)
            p = jnp.exp(ss[i] * sm_scale - lse)
            if need_mask:
                p = jnp.where(msk, p, 0.0)
            ps.append(p)
            dss.append(p * (dps[i] - di) * sm_scale)
        for i, g in enumerate(hs):
            kb = g // R
            kv = slice(kb * D, (kb + 1) * D)
            sl = slice(g * D, (g + 1) * D)
            q, do = qf[:, sl], dof[:, sl]
            dv = jax.lax.dot_general(ps[i].astype(do.dtype), do,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(dss[i].astype(q.dtype), q,
                                     (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dv_acc[kb] = dv if dv_acc[kb] is None else dv_acc[kb] + dv
            dk_acc[kb] = dk if dk_acc[kb] is None else dk_acc[kb] + dk
            dqs[g] = jax.lax.dot_general(dss[i].astype(kf.dtype), kf[:, kv],
                                         (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)
    zero = jnp.zeros((T, D), jnp.float32)
    dq = jnp.concatenate(dqs, axis=-1)
    dk = jnp.concatenate([zero if a is None else a for a in dk_acc], axis=-1)
    if rope:
        # dq/dk are w.r.t. the rotated q/k — inverse-rotate on the way out
        dq = _rope_rotate(dq, tab, D, inverse=True)
        dk = _rope_rotate(dk, tab, D, inverse=True)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(
        [zero if a is None else a for a in dv_acc], axis=-1).astype(dv_ref.dtype)


def _gqa_specs(n_kvblk, Wq, C, kvd_pad, block_q, block_k, q_grid_dim,
               kv_grid_dim, ndim4=True):
    """Views into GQA-packed (B, T_pad, C + 2·kvd_pad): cell h's q block is
    channels [h·Wq, (h+1)·Wq); its K/V blocks are the h-th 128-lane block of
    each kv third.  Block indices are in block-width units, so the k/v
    offsets are C//128 + h and (C + kvd_pad)//128 + h."""
    def at(t_dim, off, unit):
        if ndim4:
            def idx(b, h, i, j):
                return (b, (i, j)[t_dim], off + h)
        else:
            def idx(b, h):
                return (b, 0, off + h)
        return idx

    q_spec = pl.BlockSpec((1, block_q, Wq), at(0 if q_grid_dim == 0 else 1, 0, Wq),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, LANES),
                          at(0 if kv_grid_dim == 0 else 1, C // LANES, LANES),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, block_k, LANES),
                          at(0 if kv_grid_dim == 0 else 1,
                             (C + kvd_pad) // LANES, LANES),
                          memory_space=pltpu.VMEM)
    return q_spec, k_spec, v_spec


def _fwd_single(qkv, num_heads, kv_heads, head_dim, sm_scale, causal,
                seq_len, interpret, window=0, rope=False, rope_base=10000.0):
    B, T, _ = qkv.shape
    QH, R, KVB, n_kvblk, C, kvd, kvd_pad = _geom(num_heads, kv_heads, head_dim)
    D = head_dim
    Wq = QH * D
    # 2 per-phase (T, T) f32 lists coexist — shrink the chunk as T grows
    chunk = min(6 if T <= 256 else 3, QH)
    q_spec, k_spec, v_spec = _gqa_specs(n_kvblk, Wq, C, kvd_pad, T, T,
                                        0, 0, ndim4=False)
    kw = dict(sm_scale=sm_scale, causal=causal, seq_len=seq_len, T=T, QH=QH,
              R=R, D=D, chunk=chunk, window=window, rope=rope)
    if rope:
        kern = functools.partial(_fwd_single_kernel, **kw)
        tab_ops = (_rope_table(T, D, rope_base, qkv.dtype),)
        tab_specs = [_rope_tab_spec(T, lambda b, h: (0, 0))]
    else:
        kern = _no_tab(_fwd_single_kernel, 3, 1, **kw)
        tab_ops, tab_specs = (), []
    out, lse = pl.pallas_call(
        kern,
        grid=(B, n_kvblk),
        in_specs=[q_spec, k_spec, v_spec] + tab_specs,
        out_specs=(
            pl.BlockSpec((1, T, Wq), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QH, T, LANES), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
                   jax.ShapeDtypeStruct((B, num_heads, T, LANES), jnp.float32)),
        compiler_params=_sems(rope, "parallel", "parallel"),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * num_heads * T * T * D),
            bytes_accessed=int(2 * B * T * (C + 2 * kvd_pad) + 2 * B * T * C),
            transcendentals=int(B * num_heads * T * T)),
        interpret=interpret,
    )(qkv, qkv, qkv, *tab_ops)
    return out, lse


def _bwd_single(qkv, num_heads, kv_heads, head_dim, out, lse, do, sm_scale,
                causal, seq_len, interpret, window=0, rope=False,
                rope_base=10000.0):
    B, T, _ = qkv.shape
    QH, R, KVB, n_kvblk, C, kvd, kvd_pad = _geom(num_heads, kv_heads, head_dim)
    D = head_dim
    Wq = QH * D
    # 4 per-phase (T, T) f32 lists coexist — shrink the chunk as T grows
    chunk = min(6 if T <= 256 else 2, QH)
    q_spec, k_spec, v_spec = _gqa_specs(n_kvblk, Wq, C, kvd_pad, T, T,
                                        0, 0, ndim4=False)
    c_spec = pl.BlockSpec((1, T, Wq), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    kv_out = pl.BlockSpec((1, T, LANES), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, QH, T, LANES), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    kw = dict(sm_scale=sm_scale, causal=causal, seq_len=seq_len, T=T, QH=QH,
              R=R, D=D, KVB=KVB, chunk=chunk, window=window, rope=rope)
    if rope:
        kern = functools.partial(_bwd_single_kernel, **kw)
        tab_ops = (_rope_table(T, D, rope_base, qkv.dtype),)
        tab_specs = [_rope_tab_spec(T, lambda b, h: (0, 0))]
    else:
        kern = _no_tab(_bwd_single_kernel, 6, 1, **kw)
        tab_ops, tab_specs = (), []
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B, n_kvblk),
        in_specs=[q_spec, k_spec, v_spec, c_spec, c_spec, lse_spec]
                 + tab_specs,
        out_specs=(c_spec, kv_out, kv_out),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
                   jax.ShapeDtypeStruct((B, T, kvd_pad), qkv.dtype),
                   jax.ShapeDtypeStruct((B, T, kvd_pad), qkv.dtype)),
        compiler_params=_sems(rope, "parallel", "parallel"),
        interpret=interpret,
    )(qkv, qkv, qkv, out, do, lse, *tab_ops)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# multi-tile forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, tq_ref, tk_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, sm_scale, causal, block_q, block_k, n_kv, seq_len, T,
                QH, R, D, chunk, window=0, rope=False):
    i_q, i_kv = pl.program_id(2), pl.program_id(3)

    @pl.when(i_kv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    run = (i_q * block_q + block_q - 1 >= i_kv * block_k) if causal else True
    if window:
        run = jnp.logical_and(
            run, _tile_overlaps_band(i_q, i_kv, block_q, block_k, window))

    @pl.when(run)
    def _compute():
        if rope:
            # scale folds into the rotation's cos/sin for free
            qf = _rope_rotate(q_ref[0], tq_ref[:], D,
                              scale=sm_scale).astype(q_ref.dtype)
            kf = _rope_rotate(k_ref[0], tk_ref[:], D).astype(k_ref.dtype)
        else:
            qf = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
            kf = k_ref[0]
        vf = v_ref[0]

        def body(masked: bool):
            if masked:
                msk = _mask((block_q, block_k), i_q, i_kv, block_q, block_k,
                            causal, seq_len, window)
            for hs in _chunks(QH, chunk):
                ss = []
                for g in hs:
                    kv = slice((g // R) * D, (g // R + 1) * D)
                    ss.append(jax.lax.dot_general(
                        qf[:, g * D:(g + 1) * D], kf[:, kv],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
                ps, alphas = [], []
                for i, g in enumerate(hs):
                    s = jnp.where(msk, ss[i], MASK_VALUE) if masked else ss[i]
                    m_prev, l_prev = m_scr[g], l_scr[g]
                    m_curr = jnp.max(s, axis=1, keepdims=True)
                    m_next = jnp.maximum(m_prev, m_curr)
                    alpha = jnp.exp(m_prev - m_next)
                    p = jnp.exp(s - m_next[:, :1])
                    m_scr[g] = m_next
                    l_scr[g] = alpha * l_prev + jnp.sum(p, axis=1,
                                                        keepdims=True)
                    ps.append(p)
                    alphas.append(alpha)
                for i, g in enumerate(hs):
                    kv = slice((g // R) * D, (g // R + 1) * D)
                    pv = jax.lax.dot_general(ps[i].astype(vf.dtype),
                                             vf[:, kv],
                                             (((1,), (0,)), ((), ())),
                                             preferred_element_type=jnp.float32)
                    acc_scr[g] = acc_scr[g] * alphas[i][:, :1] + pv

        has_pad = seq_len != T
        if not causal and not has_pad:
            body(masked=False)
        else:
            edge = False
            if causal:
                edge = i_q * block_q < (i_kv + 1) * block_k
            if window:
                edge = jnp.logical_or(edge, _band_crosses_tile(
                    i_q, i_kv, block_q, block_k, window))
            if has_pad:
                edge = jnp.logical_or(edge, i_kv == n_kv - 1)

            @pl.when(edge)
            def _():
                body(masked=True)

            @pl.when(jnp.logical_not(edge))
            def _():
                body(masked=False)

    @pl.when(i_kv == n_kv - 1)
    def _finalize():
        outs = []
        for g in range(QH):
            l = l_scr[g][:, :1]
            l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
            outs.append(acc_scr[g] * l_inv)
            m = m_scr[g][:, :1]
            lse = jnp.where(l == 0.0, MASK_VALUE,
                            m + jnp.log(jnp.maximum(l, 1e-38)))
            lse_ref[0, g] = jnp.broadcast_to(lse, lse_ref.shape[2:])
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def _fwd(qkv, num_heads, kv_heads, head_dim, sm_scale, causal, seq_len,
         block_q, block_k, interpret, window=0, rope=False,
         rope_base=10000.0):
    B, T, _ = qkv.shape
    if T <= block_q and T <= block_k:
        return _fwd_single(qkv, num_heads, kv_heads, head_dim, sm_scale,
                           causal, seq_len, interpret, window, rope,
                           rope_base)
    QH, R, KVB, n_kvblk, C, kvd, kvd_pad = _geom(num_heads, kv_heads, head_dim)
    D = head_dim
    Wq = QH * D
    chunk = _fwd_chunk(QH, block_q)
    n_q, n_kv = T // block_q, T // block_k
    q_spec, k_spec, v_spec = _gqa_specs(n_kvblk, Wq, C, kvd_pad, block_q,
                                        block_k, q_grid_dim=0, kv_grid_dim=1)
    kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q,
              block_k=block_k, n_kv=n_kv, seq_len=seq_len, T=T, QH=QH, R=R,
              D=D, chunk=chunk, window=window, rope=rope)
    if rope:
        kern = functools.partial(_fwd_kernel, **kw)
        tab_ops = (_rope_table(T, D, rope_base, qkv.dtype),) * 2
        tab_specs = [_rope_tab_spec(block_q, lambda b, h, i, j: (i, 0)),
                     _rope_tab_spec(block_k, lambda b, h, i, j: (j, 0))]
    else:
        kern = _no_tab(_fwd_kernel, 3, 2, **kw)
        tab_ops, tab_specs = (), []
    out, lse = pl.pallas_call(
        kern,
        grid=(B, n_kvblk, n_q, n_kv),
        in_specs=[q_spec, k_spec, v_spec] + tab_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, Wq), lambda b, h, i, j: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, QH, block_q, LANES),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
                   jax.ShapeDtypeStruct((B, num_heads, T, LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((QH, block_q, LANES), jnp.float32),
                        pltpu.VMEM((QH, block_q, LANES), jnp.float32),
                        pltpu.VMEM((QH, block_q, D), jnp.float32)],
        compiler_params=_sems(rope, "parallel", "parallel", "parallel",
                              "arbitrary", vmem=GQA_VMEM_LIMIT),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * num_heads * T * T * D * (0.5 if causal else 1.0)),
            bytes_accessed=int(2 * B * T * (C + 2 * kvd_pad) + 2 * B * T * C),
            transcendentals=int(B * num_heads * T * T)),
        interpret=interpret,
    )(qkv, qkv, qkv, *tab_ops)
    return out, lse


# ---------------------------------------------------------------------------
# multi-tile backward
# ---------------------------------------------------------------------------

def _bwd_body(qf, kf, vf, dof, of, lse_ref, msk, hs, *, sm_scale, R, D):
    """One chunk's phase-split s/dp -> p/ds recompute, shared by the three
    multi-tile backward kernels.  Returns (ps, dss) lists indexed like hs."""
    ss, dps = [], []
    for g in hs:
        kv = slice((g // R) * D, (g // R + 1) * D)
        sl = slice(g * D, (g + 1) * D)
        ss.append(jax.lax.dot_general(
            qf[:, sl], kf[:, kv], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
        dps.append(jax.lax.dot_general(
            dof[:, sl], vf[:, kv], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    ps, dss = [], []
    for i, g in enumerate(hs):
        sl = slice(g * D, (g + 1) * D)
        lse = lse_ref[0, g][:, :1]
        di = jnp.sum(of[:, sl].astype(jnp.float32)
                     * dof[:, sl].astype(jnp.float32), axis=1, keepdims=True)
        p = jnp.exp(ss[i] - lse)
        if msk is not None:
            p = jnp.where(msk, p, 0.0)
        ps.append(p)
        dss.append(p * (dps[i] - di) * sm_scale)
    return ps, dss


def _edge_dispatch(body, causal, window, has_pad, i_q, i_kv, block_q,
                   block_k, last_kv):
    """Shared masked/unmasked tile dispatch (mirrors the MHA kernels)."""
    if not causal and not has_pad:
        body(masked=False)
        return
    edge = False
    if causal:
        edge = i_q * block_q < (i_kv + 1) * block_k
    if window:
        edge = jnp.logical_or(edge, _band_crosses_tile(
            i_q, i_kv, block_q, block_k, window))
    if has_pad:
        edge = jnp.logical_or(edge, last_kv)

    @pl.when(edge)
    def _():
        body(masked=True)

    @pl.when(jnp.logical_not(edge))
    def _():
        body(masked=False)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref,
                    tq_ref, tk_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                    *, sm_scale, causal, block_q, block_k, n_q, seq_len, T,
                    QH, R, D, KVB, chunk, window=0, rope=False):
    i_kv, i_q = pl.program_id(2), pl.program_id(3)

    @pl.when(i_q == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    run = (i_q * block_q + block_q - 1 >= i_kv * block_k) if causal else True
    if window:
        run = jnp.logical_and(
            run, _tile_overlaps_band(i_q, i_kv, block_q, block_k, window))

    @pl.when(run)
    def _compute():
        qf, kf, vf, dof = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        of = o_ref[0]
        if rope:
            qf = _rope_rotate(qf, tq_ref[:], D).astype(qf.dtype)
            kf = _rope_rotate(kf, tk_ref[:], D).astype(kf.dtype)
        sqf = (qf.astype(jnp.float32) * sm_scale).astype(qf.dtype)

        def body(masked: bool):
            msk = (_mask((block_q, block_k), i_q, i_kv, block_q, block_k,
                         causal, seq_len, window) if masked else None)
            for hs in _chunks(QH, chunk):
                ps, dss = _bwd_body(sqf, kf, vf, dof, of, lse_ref, msk, hs,
                                    sm_scale=sm_scale, R=R, D=D)
                for i, g in enumerate(hs):
                    kb = g // R
                    sl = slice(g * D, (g + 1) * D)
                    q, do = qf[:, sl], dof[:, sl]
                    dv_scr[kb] += jax.lax.dot_general(
                        ps[i].astype(do.dtype), do, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dk_scr[kb] += jax.lax.dot_general(
                        dss[i].astype(q.dtype), q, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

        _edge_dispatch(body, causal, window, seq_len != T, i_q, i_kv,
                       block_q, block_k, i_kv == pl.num_programs(2) - 1)

    @pl.when(i_q == n_q - 1)
    def _finalize():
        dk = jnp.concatenate([dk_scr[k] for k in range(KVB)], axis=-1)
        if rope:
            dk = _rope_rotate(dk, tk_ref[:], D, inverse=True)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = jnp.concatenate([dv_scr[k] for k in range(KVB)],
                                    axis=-1).astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref,
                   tq_ref, tk_ref, dq_ref, dq_scr,
                   *, sm_scale, causal, block_q, block_k, n_kv, seq_len, T,
                   QH, R, D, chunk, window=0, rope=False):
    i_q, i_kv = pl.program_id(2), pl.program_id(3)

    @pl.when(i_kv == 0)
    def _init():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    run = (i_q * block_q + block_q - 1 >= i_kv * block_k) if causal else True
    if window:
        run = jnp.logical_and(
            run, _tile_overlaps_band(i_q, i_kv, block_q, block_k, window))

    @pl.when(run)
    def _compute():
        qf, kf, vf, dof = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        of = o_ref[0]
        if rope:
            qf = _rope_rotate(qf, tq_ref[:], D).astype(qf.dtype)
            kf = _rope_rotate(kf, tk_ref[:], D).astype(kf.dtype)
        sqf = (qf.astype(jnp.float32) * sm_scale).astype(qf.dtype)

        def body(masked: bool):
            msk = (_mask((block_q, block_k), i_q, i_kv, block_q, block_k,
                         causal, seq_len, window) if masked else None)
            for hs in _chunks(QH, chunk):
                _, dss = _bwd_body(sqf, kf, vf, dof, of, lse_ref, msk, hs,
                                   sm_scale=sm_scale, R=R, D=D)
                for i, g in enumerate(hs):
                    kv = slice((g // R) * D, (g // R + 1) * D)
                    dq_scr[g] += jax.lax.dot_general(
                        dss[i].astype(kf.dtype), kf[:, kv],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

        _edge_dispatch(body, causal, window, seq_len != T, i_q, i_kv,
                       block_q, block_k, i_kv == n_kv - 1)

    @pl.when(i_kv == n_kv - 1)
    def _finalize():
        dq = jnp.concatenate([dq_scr[g] for g in range(QH)], axis=-1)
        if rope:
            dq = _rope_rotate(dq, tq_ref[:], D, inverse=True)
        dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_combined_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref,
                         tab_ref, dq_ref, dk_ref, dv_ref,
                         dq_scr, dk_scr, dv_scr,
                         *, sm_scale, causal, block_q, block_k, n_kv, n_q,
                         seq_len, T, QH, R, D, KVB, chunk, window=0,
                         rope=False):
    """Single-pass GQA backward: grid (B, kvblk, kv, q); p computed once per
    tile feeds dk/dv (per-KV-HEAD block scratch) and dq (whole-sequence
    (QH, T, D) scratch persisting across the kv sweep)."""
    i_kv, i_q = pl.program_id(2), pl.program_id(3)

    @pl.when(jnp.logical_and(i_kv == 0, i_q == 0))
    def _init_dq():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(i_q == 0)
    def _init_dkv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    run = (i_q * block_q + block_q - 1 >= i_kv * block_k) if causal else True
    if window:
        run = jnp.logical_and(
            run, _tile_overlaps_band(i_q, i_kv, block_q, block_k, window))

    @pl.when(run)
    def _compute():
        qf, kf, vf, dof = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        of = o_ref[0]
        if rope:
            # one whole-sequence table ref, sliced per block (the dq
            # epilogue spans all of T); counted by the admission estimate
            qf = _rope_rotate(qf, tab_ref[pl.ds(i_q * block_q, block_q)],
                              D).astype(qf.dtype)
            kf = _rope_rotate(kf, tab_ref[pl.ds(i_kv * block_k, block_k)],
                              D).astype(kf.dtype)
        sqf = (qf.astype(jnp.float32) * sm_scale).astype(qf.dtype)

        def body(masked: bool):
            msk = (_mask((block_q, block_k), i_q, i_kv, block_q, block_k,
                         causal, seq_len, window) if masked else None)
            for hs in _chunks(QH, chunk):
                ps, dss = _bwd_body(sqf, kf, vf, dof, of, lse_ref, msk, hs,
                                    sm_scale=sm_scale, R=R, D=D)
                for i, g in enumerate(hs):
                    kb = g // R
                    kv = slice(kb * D, (kb + 1) * D)
                    sl = slice(g * D, (g + 1) * D)
                    q, do = qf[:, sl], dof[:, sl]
                    dv_scr[kb] += jax.lax.dot_general(
                        ps[i].astype(do.dtype), do, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dk_scr[kb] += jax.lax.dot_general(
                        dss[i].astype(q.dtype), q, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    dq_scr[g, pl.ds(i_q * block_q, block_q)] += \
                        jax.lax.dot_general(dss[i].astype(kf.dtype),
                                            kf[:, kv],
                                            (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.float32)

        _edge_dispatch(body, causal, window, seq_len != T, i_q, i_kv,
                       block_q, block_k, i_kv == n_kv - 1)

    @pl.when(i_q == n_q - 1)
    def _write_dkv():
        dk = jnp.concatenate([dk_scr[k] for k in range(KVB)], axis=-1)
        if rope:
            dk = _rope_rotate(dk, tab_ref[pl.ds(i_kv * block_k, block_k)],
                              D, inverse=True)
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = jnp.concatenate([dv_scr[k] for k in range(KVB)],
                                    axis=-1).astype(dv_ref.dtype)

    @pl.when(jnp.logical_and(i_kv == n_kv - 1, i_q == n_q - 1))
    def _write_dq():
        dq = jnp.concatenate([dq_scr[g] for g in range(QH)], axis=-1)
        if rope:
            # whole-sequence dq scratch: rows span all of T
            dq = _rope_rotate(dq, tab_ref[:], D, inverse=True)
        dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_parts(qkv, num_heads, kv_heads, head_dim, out, lse, do, sm_scale,
               causal, seq_len, block_q, block_k, interpret, window=0,
               rope=False, rope_base=10000.0):
    """GQA backward returning (dq, dk, dv) with dq (B, T, C) and dk/dv at
    the SMALL padded width (B, T, kvd_pad) — already group-summed in kernel;
    callers slice [:kvd] and feed the projection backward directly."""
    B, T, _ = qkv.shape
    QH = _geom(num_heads, kv_heads, head_dim)[0]
    if QH >= 6 and T % 256 == 0:
        # Mosaic double-buffers every in/out block: at QH=6 the dq kernel's
        # (block, QH·D)-wide q/do/o tiles measured 944 KB over the 16 MB
        # scoped-vmem stack at 512 blocks (GPT-2 124M kv=4) — halve the
        # tiles (T_pad is a 512-multiple, so 256 still divides it); applied
        # BEFORE the single-tile dispatch so a T=512 QH>=6 backward tiles
        # at 256 instead of one VMEM-heavy whole-sequence tile
        block_q, block_k = min(block_q, 256), min(block_k, 256)
    if T <= block_q and T <= block_k:
        return _bwd_single(qkv, num_heads, kv_heads, head_dim, out, lse, do,
                           sm_scale, causal, seq_len, interpret, window,
                           rope, rope_base)
    _, R, KVB, n_kvblk, C, kvd, kvd_pad = _geom(num_heads, kv_heads, head_dim)
    D = head_dim
    Wq = QH * D
    chunk = _bwd_chunk(QH, block_q)
    n_q, n_kv = T // block_q, T // block_k
    semantics = _sems(rope, "parallel", "parallel", "parallel",
                      "arbitrary")

    # dKV pass: grid (B, kvblk, kv, q) — q sequential
    q_spec, k_spec, v_spec = _gqa_specs(n_kvblk, Wq, C, kvd_pad, block_q,
                                        block_k, q_grid_dim=1, kv_grid_dim=0)
    do_spec = pl.BlockSpec((1, block_q, Wq), lambda b, h, i, j: (b, j, h),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, QH, block_q, LANES),
                            lambda b, h, i, j: (b, h, j, 0),
                            memory_space=pltpu.VMEM)
    kv_out_spec = pl.BlockSpec((1, block_k, LANES),
                               lambda b, h, i, j: (b, i, h),
                               memory_space=pltpu.VMEM)

    tab = _rope_table(T, D, rope_base, qkv.dtype) if rope else None

    # combined single-pass admission: a REAL per-cell VMEM estimate — the
    # MHA kernel's 6-bytes/elem rule under-counts the QH-scaled lse block
    # and the wider q/do/o tiles of the per-KV-block grid (the GQA fwd at
    # QH=6/chunk=4 measured 312 KB over the 16 MB scoped-vmem stack)
    est = (4 * chunk * block_q * block_k * 4            # ss/dps/ps/dss lists
           + QH * T * D * 4                             # dq scratch
           + 2 * KVB * block_k * D * 4                  # dk/dv scratch
           # in/out blocks, DOUBLE-buffered by the Mosaic pipeline:
           + 2 * (T * Wq * 2                            # dq out (whole seq)
                  + QH * block_q * LANES * 4            # lse
                  + 3 * block_q * Wq * 2                # q/do/o
                  + 2 * block_k * LANES * 2             # k/v
                  + 2 * block_k * LANES * 2))           # dk/dv out
    if rope:
        est += 2 * T * 2 * LANES * qkv.dtype.itemsize  # whole-seq rope table
    # (raising the budget to admit combined at GPT-2 kv=4 via a 32 MB stack
    # measured WORSE: 143.5k vs the pair's 144.9k tok/s — the QH-wide dq
    # scratch residency beats the saved p recompute here; gate unchanged)
    if est <= COMBINED_GQA_BUDGET:
        dq_out_spec = pl.BlockSpec((1, T, Wq), lambda b, h, i, j: (b, 0, h),
                                   memory_space=pltpu.VMEM)
        combined_semantics = _sems(rope, "parallel", "parallel",
                                   "arbitrary", "arbitrary")
        kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q,
                  block_k=block_k, n_kv=n_kv, n_q=n_q, seq_len=seq_len,
                  T=T, QH=QH, R=R, D=D, KVB=KVB, chunk=chunk, window=window,
                  rope=rope)
        if rope:
            kern = functools.partial(_bwd_combined_kernel, **kw)
            tab_ops = (tab,)
            tab_specs = [_rope_tab_spec(T, lambda b, h, i, j: (0, 0))]
        else:
            kern = _no_tab(_bwd_combined_kernel, 6, 1, **kw)
            tab_ops, tab_specs = (), []
        dq, dk, dv = pl.pallas_call(
            kern,
            grid=(B, n_kvblk, n_kv, n_q),
            in_specs=[q_spec, k_spec, v_spec, do_spec, row_spec, do_spec]
                     + tab_specs,
            out_specs=(dq_out_spec, kv_out_spec, kv_out_spec),
            out_shape=(jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
                       jax.ShapeDtypeStruct((B, T, kvd_pad), qkv.dtype),
                       jax.ShapeDtypeStruct((B, T, kvd_pad), qkv.dtype)),
            scratch_shapes=[pltpu.VMEM((QH, T, D), jnp.float32),
                            pltpu.VMEM((KVB, block_k, D), jnp.float32),
                            pltpu.VMEM((KVB, block_k, D), jnp.float32)],
            compiler_params=combined_semantics,
            interpret=interpret,
        )(qkv, qkv, qkv, do, lse, out, *tab_ops)
        return dq, dk, dv

    kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q,
              block_k=block_k, n_q=n_q, seq_len=seq_len, T=T, QH=QH, R=R,
              D=D, KVB=KVB, chunk=chunk, window=window, rope=rope)
    if rope:
        kern = functools.partial(_bwd_dkv_kernel, **kw)
        tab_ops = (tab, tab)
        # grid (B, kvblk, kv, q): grid dim 3 (j) is the q-block index
        tab_specs = [_rope_tab_spec(block_q, lambda b, h, i, j: (j, 0)),
                     _rope_tab_spec(block_k, lambda b, h, i, j: (i, 0))]
    else:
        kern = _no_tab(_bwd_dkv_kernel, 6, 2, **kw)
        tab_ops, tab_specs = (), []
    dk, dv = pl.pallas_call(
        kern,
        grid=(B, n_kvblk, n_kv, n_q),
        in_specs=[q_spec, k_spec, v_spec, do_spec, row_spec, do_spec]
                 + tab_specs,
        out_specs=(kv_out_spec, kv_out_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, kvd_pad), qkv.dtype),
                   jax.ShapeDtypeStruct((B, T, kvd_pad), qkv.dtype)),
        scratch_shapes=[pltpu.VMEM((KVB, block_k, D), jnp.float32),
                        pltpu.VMEM((KVB, block_k, D), jnp.float32)],
        compiler_params=semantics,
        interpret=interpret,
    )(qkv, qkv, qkv, do, lse, out, *tab_ops)

    # dQ pass: grid (B, kvblk, q, kv) — kv sequential
    q_spec2, k_spec2, v_spec2 = _gqa_specs(n_kvblk, Wq, C, kvd_pad, block_q,
                                           block_k, q_grid_dim=0,
                                           kv_grid_dim=1)
    do_spec2 = pl.BlockSpec((1, block_q, Wq), lambda b, h, i, j: (b, i, h),
                            memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, QH, block_q, LANES),
                             lambda b, h, i, j: (b, h, i, 0),
                             memory_space=pltpu.VMEM)
    kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q,
              block_k=block_k, n_kv=n_kv, seq_len=seq_len, T=T, QH=QH, R=R,
              D=D, chunk=chunk, window=window, rope=rope)
    if rope:
        kern = functools.partial(_bwd_dq_kernel, **kw)
        tab_ops = (tab, tab)
        tab_specs = [_rope_tab_spec(block_q, lambda b, h, i, j: (i, 0)),
                     _rope_tab_spec(block_k, lambda b, h, i, j: (j, 0))]
    else:
        kern = _no_tab(_bwd_dq_kernel, 6, 2, **kw)
        tab_ops, tab_specs = (), []
    dq = pl.pallas_call(
        kern,
        grid=(B, n_kvblk, n_q, n_kv),
        in_specs=[q_spec2, k_spec2, v_spec2, do_spec2, row_spec2, do_spec2]
                 + tab_specs,
        out_specs=do_spec2,
        out_shape=jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((QH, block_q, D), jnp.float32)],
        compiler_params=semantics,
        interpret=interpret,
    )(qkv, qkv, qkv, do, lse, out, *tab_ops)
    return dq, dk, dv
