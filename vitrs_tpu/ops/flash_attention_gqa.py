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
                              _sems, _tile_overlaps_band, _band_crosses_tile,
                              # the SIX shared tile kernels (this module
                              # supplies only the GQA drivers/specs; MHA is
                              # the QH=G, R=1, KVB=G, chunk=G special case)
                              _chunks, _fwd_single_kernel, _bwd_single_kernel,
                              _fwd_kernel, _bwd_dkv_kernel, _bwd_dq_kernel,
                              _bwd_combined_kernel)

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


def _q_split(kv_heads: int, QH: int) -> int:
    """MQA split-cell experiment — MEASURED NEGATIVE, kept off (return 1).

    Hypothesis (round-3 verdict item 9): MQA's 0.8%-under-expanded wall
    clock came from its QH=12-heads-per-cell geometry, so splitting each
    cell into two QH=6 cells re-fetching the same KV block (reproducing
    the kv=4 winning shape: whole-group chunk, 512 fwd blocks) should
    close the gap.  Measured at GPT-2 124M kv=1 B=32: split+512 blocks
    136.6k tok/s, split+256 blocks 131.7k — BOTH lose to the unsplit
    142.1k.  The single 12-head cell amortizes each KV tile fetch over
    all 12 query heads' MXU work; split cells halve that amortization
    and double the grid, and no VMEM-pressure win materializes.  The
    remaining MHA-MQA gap is the geometry's KV-reuse structure itself,
    not a tunable.  (The split machinery in _gqa_specs/_fwd/_bwd_parts
    stays, exercised at split=1 by every GQA test, re-armable by this
    function.)"""
    return 1


def gqa_blocks(num_heads: int, kv_heads: int, head_dim: int):
    """Block sizes for the GQA grid: cells with many query heads shrink the
    tile so the QH-scaled lse/scratch and the chunked per-phase
    intermediates stay inside VMEM.  MQA's split cells (see _q_split) count
    at their per-cell head count, so kv=1 rides the 512-block fwd grid."""
    QH = _geom(num_heads, kv_heads, head_dim)[0]
    QH //= _q_split(kv_heads, QH)
    b = 512 if QH <= 6 else 256
    return b, b



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


def _gqa_specs(n_kvblk, Wq, C, kvd_pad, block_q, block_k, q_grid_dim,
               kv_grid_dim, ndim4=True, split=1):
    """Views into GQA-packed (B, T_pad, C + 2·kvd_pad): cell h's q block is
    channels [h·Wq, (h+1)·Wq); its K/V blocks are the (h // split)-th
    128-lane block of each kv third (split > 1: consecutive cells share one
    KV block — the MQA split-cell grid, see _q_split).  Block indices are
    in block-width units, so the k/v offsets are C//128 + h//split and
    (C + kvd_pad)//128 + h//split."""
    def at(t_dim, off, unit, kv=False):
        if ndim4:
            def idx(b, h, i, j):
                return (b, (i, j)[t_dim], off + (h // split if kv else h))
        else:
            def idx(b, h):
                return (b, 0, off + (h // split if kv else h))
        return idx

    q_spec = pl.BlockSpec((1, block_q, Wq), at(0 if q_grid_dim == 0 else 1, 0, Wq),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, LANES),
                          at(0 if kv_grid_dim == 0 else 1, C // LANES, LANES,
                             kv=True),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, block_k, LANES),
                          at(0 if kv_grid_dim == 0 else 1,
                             (C + kvd_pad) // LANES, LANES, kv=True),
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
    S_ = _q_split(kv_heads, QH)
    QH //= S_                       # per-CELL query heads (split-cell grid)
    Wq = QH * D
    chunk = _fwd_chunk(QH, block_q)
    n_q, n_kv = T // block_q, T // block_k
    q_spec, k_spec, v_spec = _gqa_specs(n_kvblk, Wq, C, kvd_pad, block_q,
                                        block_k, q_grid_dim=0, kv_grid_dim=1,
                                        split=S_)
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
        grid=(B, n_kvblk * S_, n_q, n_kv),
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
    S_ = _q_split(kv_heads, QH)
    QH //= S_                       # per-CELL query heads (split-cell grid;
                                    # split cells each write their OWN dk/dv
                                    # 128-lane block, summed after the call)
    Wq = QH * D
    chunk = _bwd_chunk(QH, block_q)
    n_q, n_kv = T // block_q, T // block_k
    semantics = _sems(rope, "parallel", "parallel", "parallel",
                      "arbitrary")

    # dKV pass: grid (B, kvblk, kv, q) — q sequential
    q_spec, k_spec, v_spec = _gqa_specs(n_kvblk, Wq, C, kvd_pad, block_q,
                                        block_k, q_grid_dim=1, kv_grid_dim=0,
                                        split=S_)
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
    if est <= COMBINED_GQA_BUDGET and S_ == 1:
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
        grid=(B, n_kvblk * S_, n_kv, n_q),
        in_specs=[q_spec, k_spec, v_spec, do_spec, row_spec, do_spec]
                 + tab_specs,
        out_specs=(kv_out_spec, kv_out_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, kvd_pad * S_), qkv.dtype),
                   jax.ShapeDtypeStruct((B, T, kvd_pad * S_), qkv.dtype)),
        scratch_shapes=[pltpu.VMEM((KVB, block_k, D), jnp.float32),
                        pltpu.VMEM((KVB, block_k, D), jnp.float32)],
        compiler_params=semantics,
        interpret=interpret,
    )(qkv, qkv, qkv, do, lse, out, *tab_ops)
    if S_ > 1:
        # each split cell accumulated dk/dv for ITS half of the query
        # heads into its own 128-lane block — sum over the split cells
        dk = sum(dk[..., s * kvd_pad:(s + 1) * kvd_pad] for s in range(S_))
        dv = sum(dv[..., s * kvd_pad:(s + 1) * kvd_pad] for s in range(S_))

    # dQ pass: grid (B, kvblk, q, kv) — kv sequential
    q_spec2, k_spec2, v_spec2 = _gqa_specs(n_kvblk, Wq, C, kvd_pad, block_q,
                                           block_k, q_grid_dim=0,
                                           kv_grid_dim=1, split=S_)
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
        grid=(B, n_kvblk * S_, n_q, n_kv),
        in_specs=[q_spec2, k_spec2, v_spec2, do_spec2, row_spec2, do_spec2]
                 + tab_specs,
        out_specs=do_spec2,
        out_shape=jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((QH, block_q, D), jnp.float32)],
        compiler_params=semantics,
        interpret=interpret,
    )(qkv, qkv, qkv, do, lse, out, *tab_ops)
    return dq, dk, dv
