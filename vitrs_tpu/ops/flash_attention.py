"""Pallas TPU flash attention — forward and backward, packed-qkv native.

The reference materializes the full O(B·NH·T²) `preatt`/`att` score buffers in
HBM and loops over them scalar-wise (rusty_vit.rs:512-563, buffers at
rusty_vit.rs:157-158); its backward re-reads the stashed `att`
(train_vit.rs:559-601).  Its own running-max softmax (attention.rs:22-44) is
the scalar seed of exactly the algorithm used here: blockwise **online
softmax** — only running (m, l, acc) statistics live on-chip and the score
matrix never touches HBM.

Layout: the kernels read the reference's packed activation layout directly —
qkv (B, T, 3C) with head h's Q at channels [h·D, (h+1)·D), K at C + h·D, V at
2C + h·D (rusty_vit.rs:520-555).  BlockSpec index maps slice heads straight
out of HBM, so there is **no transpose or split anywhere** on the hot path;
the same qkv buffer is passed three times with three index maps (three views,
zero copies).

Mosaic requires the last block dimension to be a multiple of 128 lanes, and
every target config has head_dim D = 64 — so each grid cell owns a 128-wide
channel block covering G = 128//D heads and the kernel iterates the G heads
with per-head scratch (the loop is unrolled at trace time; both heads' matmuls
pipeline on the MXU).  Configs where 128 % D != 0 or NH % G != 0 fall back to
the dense XLA path (ops/attention.py).

Grid: (B, NH//G, n_q, n_kv) with the KV axis innermost/sequential so the VMEM
scratch accumulators persist across KV tiles of one Q tile; the other axes are
parallel (megacore-friendly).

Backward is recompute-based (standard flash decomposition):
  forward saves out and per-row lse = m + log(l);
  dKV kernel:  for each KV tile, sweep Q tiles:  p = exp(s·scale - lse),
               dv += pᵀ·do,  ds = p∘(do·vᵀ - di)·scale,  dk += dsᵀ·q
  dQ kernel:   for each Q tile, sweep KV tiles:  dq += ds·k
  with di = Σ_d(out ∘ dout) per head, recomputed per tile from the out/do
  blocks already in VMEM (a precomputed di would have to stream in the
  (B, H, T, 128) lane-broadcast layout — ~400 MB/layer at GPT-2 B=32).

Causal mode skips tiles strictly above the diagonal at the grid level; padded
key columns (T padded to a block multiple) are masked with a finite -1e30 so
exp never sees inf-inf.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 512 measured best across configs on v5e: T<=512 (all ViT/CLIP towers, incl.
# CLIP-L/14's 257 tokens) rides the single-tile path with no padding, and the
# causal GPT T=1024 grid drops to 2x2 tiles (fewer cells, same VMEM head-room)
DEFAULT_BLOCK_Q = int(os.environ.get("VITRS_FA_BLOCK_Q", "512"))
DEFAULT_BLOCK_K = int(os.environ.get("VITRS_FA_BLOCK_K", "512"))
MASK_VALUE = -1e30
LANES = 128
# Round-5 fwd-softmax experiment: route the row-sum of p through the MXU
# (p @ ones, landing lane-broadcast) instead of a cross-lane VPU reduce —
# the forward is VPU-bound (BASELINE.md attribution: 116.8 vs bwd's
# 127.6 TF/s) and the sum is the one big reduce that CAN leave the VPU.
FWD_MXU_LSUM = os.environ.get("VITRS_FA_FWD_MXU_LSUM", "0") == "1"
# Constant-substitution isolation knobs (TIMING ONLY — wrong math): replace
# the fwd softmax's transcendentals/reduces with cheap stand-ins of the
# same shapes to attribute the VPU residue per mechanism (the ROPE_DIAG
# method).  "noexp" = both exps -> linear; "nomax" = running-max machinery
# -> constants (keeps the big exp); "" = production math.
FWD_DIAG = os.environ.get("VITRS_FA_DIAG", "")
# Split the per-head max/alpha work into its own phase before any exp: the
# max's cross-lane tree reduce is the serial link between a head's s-dot
# and its exp — listing all heads' maxes first gives Mosaic a window to
# overlap head g's reduce with head g-1's exp stream.
FWD_SPLITMAX = os.environ.get("VITRS_FA_SPLITMAX", "0") == "1"
# Multi-tile backward runs with a 32 MB Mosaic scoped-vmem stack (the
# 16 MB default is a compiler knob, not hardware — v5e VMEM is 128 MB):
# that admits the G=4 phase-split backward (more independent head chains
# for MXU/VPU overlap; did not compile at 16 MB) and the whole-sequence
# combined kernel out to T=8192.  Measured at GPT-2 124M (ms/step or
# tok/s, B as in BASELINE.md): T=1024 226.8 -> 225.0; T=2048 119.6k ->
# 121.3k; T=4096 82.5k -> 96.3k (combined admitted, was pair); T=8192
# 54.6k -> 66.4k.  64 MB measured no better than 32 (T=4096: 95.5 vs
# 96.3k).
BWD_VMEM_LIMIT = 32 << 20
# Combined single-pass admission: _combined_bwd_est's per-cell VMEM
# estimate against this budget (0 forces the dKV/dQ pair — tests).
# Calibration at D=64, block 512 under the 32 MB stack: G=4/T=2048 est
# 26.8 MB compiles AND wins; G=4/T=4096 est 31.0 MB fails to compile;
# G=2/T=8192 est 19.7 MB compiles and wins by 21%.
COMBINED_BWD_VMEM_LIMIT = 28 << 20


def _combined_bwd_est(G, T, D, block_q, block_k, itemsize, tab_bytes):
    """Estimated scoped-VMEM bytes of one combined-backward grid cell:
    the 4 per-phase (block_q, block_k) f32 lists per head of the group,
    the whole-sequence f32 dq scratch, and the double-buffered blocks
    (dq out spans all of T; lse/q/do/o/k/v/dk/dv scratch per tile).

    The 2x T·W dq-out term is the MEASURED whole-T footprint (two T-wide
    W-lane buffers): at T=16384/G=2/D=64/block 512 Mosaic's actual scoped
    allocation was 34.41 MB where the single-buffer accounting said 27.25
    — the missing ~T·W·itemsize is the second whole-T staging buffer, and
    adding it keeps every measured-working shape admitted (T=8192/G=2 ->
    23.45 MB <= 28) while correctly rejecting T=16384 to the dKV/dQ
    pair."""
    W = G * D
    return (4 * G * block_q * block_k * 4          # ss/dps/ps/dss lists
            + G * T * D * 4                        # dq scratch
            + 2 * 2 * T * W * itemsize             # dq out (whole-T, 2 bufs)
            + 2 * G * block_q * LANES * 4          # lse block (dbl-buf)
            + 2 * 3 * block_q * W * itemsize       # q/do/o tiles (dbl-buf)
            + 2 * 2 * block_k * W * itemsize       # k/v tiles (dbl-buf)
            + 2 * G * block_k * D * 4 * 2          # dk/dv scratch + out
            + tab_bytes)


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def supports(num_heads: int, head_dim: int) -> bool:
    """Whether the packed kernel can run this geometry (else dense fallback)."""
    if head_dim >= LANES:
        return head_dim % LANES == 0
    return LANES % head_dim == 0 and num_heads % (LANES // head_dim) == 0


def padded_num_heads(num_heads: int, head_dim: int) -> Optional[int]:
    """Smallest head count >= num_heads the packed kernel can tile, or None
    when no head-count padding helps (head_dim itself not lane-tileable).

    Odd head counts (GPT-2 1.5B has 25 heads of 64 — advisor r2 finding:
    supports() rejected it and the preset silently fell back to dense
    O(B·25·T²) attention) are handled by running the kernel with zero-padded
    phantom heads: zero K rows give uniform softmax over zero V rows, so the
    phantom outputs are exactly zero, sliced off by the caller, and their
    gradients vanish — math identical, ~1/25 extra attention FLOPs."""
    if supports(num_heads, head_dim):
        return num_heads
    if head_dim >= LANES or LANES % head_dim != 0:
        return None
    g = LANES // head_dim
    return _ceil_to(num_heads, g)


def pad_qkv_weight(qkvw: jax.Array, qkvb: Optional[jax.Array],
                   num_heads: int, num_heads_pad: int, head_dim: int):
    """Zero-pad a packed (3C, C) projection weight per Q|K|V third to
    (3C', C) so the projection emits the phantom-head packed layout
    directly (no activation relayout on the hot path)."""
    C = num_heads * head_dim
    Cp = num_heads_pad * head_dim
    if Cp == C:
        return qkvw, qkvb
    thirds = [qkvw[i * C:(i + 1) * C] for i in range(3)]
    pad = jnp.zeros((Cp - C, qkvw.shape[1]), qkvw.dtype)
    w = jnp.concatenate([t for third in thirds for t in (third, pad)], axis=0)
    b = None
    if qkvb is not None:
        bt = [qkvb[i * C:(i + 1) * C] for i in range(3)]
        bpad = jnp.zeros((Cp - C,), qkvb.dtype)
        b = jnp.concatenate([t for third in bt for t in (third, bpad)])
    return w, b


def _heads_per_block(head_dim: int) -> int:
    return max(1, LANES // head_dim)


def _heads_per_block_multi_fwd(head_dim: int, num_heads: int) -> int:
    """Multi-tile head group: largest lane-aligned G <= 4 dividing
    num_heads.  Measured at GPT-2 shape (T=1024, block 512): G=4 runs
    1.434 vs 1.803 ms/layer (-20%) forward — the phase-split schedule
    again (G=6/G=12 with a raised vmem stack measured no further gain).
    The multi-tile BACKWARD also prefers this G now that its 32 MB scoped
    stack (BWD_VMEM_LIMIT) fits the 4x per-phase list sets, falling to the
    minimum G only when the combined kernel's whole-sequence dq scratch
    would not fit at G=4 (see _bwd_parts policy)."""
    base = _heads_per_block(head_dim)
    for g in range(min(4, num_heads), base - 1, -1):
        if num_heads % g == 0 and (g * head_dim) % LANES == 0:
            return g
    return base


def _heads_per_block_single(head_dim: int, num_heads: int) -> int:
    """Single-tile kernels take the LARGEST lane-aligned head group that
    divides num_heads (≤6 heads: VMEM for the per-phase (T, T) f32
    intermediates).  More heads per block = more independent chains for the
    phase-split schedule to overlap — measured 0.649 (G=6) vs 0.705 (G=2)
    ms/call at ViT-B shape; whole-model ViT-B at G=12 and ViT-L at G=8/16
    under a raised 32-64 MB scoped stack measured NO further gain (1171
    vs 1169 img/s; 337.5/331.3 vs 335), so 6 stays.  The multi-tile path
    caps at G=4 (see _heads_per_block_multi_fwd)."""
    base = _heads_per_block(head_dim)
    for g in range(min(6, num_heads), base - 1, -1):
        if num_heads % g == 0 and (g * head_dim) % LANES == 0:
            return g
    return base


def _rope_swap(x, D):
    """Signed rotate-half of every D-lane head in a (rows, W) tile, on the
    MXU: y = x @ P with P[p, r] = -1 at p = r + D/2 (r in a head's first
    half) and +1 at p = r - D/2 (second half), i.e. y = [-x2 | x1] per head.

    Lane permutations at D/2 = 32-lane granularity lower to slow Mosaic
    vector relayouts (same pathology as the measured lse-relayout negative
    result) — a (W, W) ±1 constant dot is ~150 MFLOP per 512-row tile and
    rides the otherwise-idle MXU instead.  P is built from iota compares
    (cheap VPU) rather than streamed."""
    W = x.shape[-1]
    half = D // 2
    # pure i32 arithmetic build — comparing a dim0-varying iota against a
    # dim1-varying one produces an i1 vector whose replicated-layout
    # transition Mosaic rejects ("Invalid relayout ... vector<WxWxi1>"),
    # so equality is clamp(1 - |delta|) and the half sign is 2b-1
    pi = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    ri = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    b = (ri % D) // half                                # 0 first half, 1 second
    delta = pi - (ri + half - D * b)                    # 0 at the pair partner
    eq = 1 - jnp.minimum(jnp.abs(delta), 1)
    p = (eq * (2 * b - 1)).astype(x.dtype)
    return jax.lax.dot_general(x, p, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _rope_table(T, D, base, dtype):
    """The (T, 2·LANES) [cos | sin] position table the rope kernels STREAM
    instead of recomputing: lane l of either half carries angle
    pos · base^-(((l % D) % (D/2)) / (D/2)) — the per-head pattern repeats
    every D lanes, so 128 lanes cover any tile width by lane-repetition
    (`_rope_rotate`).  Computed once per step in XLA (identical across
    layers → CSE'd) in the array dtype: bf16 table quantization matches the
    bf16 rotated-q/k quantization the MXU dots see anyway.

    Measured motivation (GPT-2 124M B=32, T=1024): in-kernel iota trig cost
    48 ms/step — ~50% more VPU transcendental work on kernels already
    VPU-bound by the softmax exp — while the rest of the in-kernel rope
    machinery (table multiply + MXU swap + plumbing) measured ~3 ms
    (ROPE_DIAG isolation: plumb 227.5 / notrig 230.1 / noswap 275.6 /
    full 280.3 vs 226.8 no-rope).  Streaming the table moves the trig off
    the hot path entirely; Pallas re-fetches a block only when its index
    changes, so the q-position blocks ride along for free on inner-kv
    grids."""
    assert D % 2 == 0 and LANES % D == 0, D
    half = D // 2
    j = (jnp.arange(LANES, dtype=jnp.int32) % D) % half
    inv_freq = jnp.exp(j.astype(jnp.float32) * (-math.log(base) / half))
    ang = jnp.arange(T, dtype=jnp.float32)[:, None] * inv_freq[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=1).astype(dtype)


def _rope_tab_spec(block, index_map):
    return pl.BlockSpec((block, 2 * LANES), index_map,
                        memory_space=pltpu.VMEM)


# rope mode streams [cos|sin] table blocks on top of the tuned-to-16MB
# working sets — an f32 T=1024 forward measured 16 KB over the default
# scoped-vmem stack — so rope calls get a raised Mosaic limit (v5e VMEM is
# 128 MB; 32 MB of scoped stack leaves ample pipeline-buffer room)
ROPE_VMEM_LIMIT = 32 << 20


def _sems(rope, *sems, vmem=None):
    """CompilerParams: `vmem` (bytes) sets the Mosaic scoped-vmem stack
    explicitly; otherwise rope mode raises it to ROPE_VMEM_LIMIT for the
    streamed-table blocks."""
    kw = {"dimension_semantics": sems}
    if vmem or rope:
        kw["vmem_limit_bytes"] = vmem or ROPE_VMEM_LIMIT
    return pltpu.CompilerParams(**kw)


def _no_tab(inner, n_in, n_tab, **kw):
    """rope=False shim: the kernels take their table ref(s) right after the
    input refs; non-rope pallas_calls pass no table operand, so inject
    Nones at trace time (the rope=False branch never touches them)."""
    def kern(*refs):
        inner(*refs[:n_in], *([None] * n_tab), *refs[n_in:], **kw)
    return kern


def _rope_rotate(x, tab, D, inverse=False, scale=None):
    """In-kernel RoPE: rotate a (rows, W) tile of packed D-lane heads using
    the streamed (rows, 2·LANES) [cos | sin] table slice `tab`
    (`_rope_table`).

    Full form: out = x*cosF + (x @ P)*sinF with the rotate-half pair signs
    folded into the ±1 permutation P (`_rope_swap`, MXU); inverse flips
    sinF — R is orthogonal so R(-θ) = Rᵀ is the exact VJP transpose.
    scale (the softmax 1/√D) folds into cos/sin for free.  Returns f32."""
    rows, W = x.shape
    cos = tab[:, :LANES].astype(jnp.float32)
    sin = tab[:, LANES:].astype(jnp.float32)
    if W < LANES:
        assert W % D == 0, (W, D)
        cos, sin = cos[:, :W], sin[:, :W]
    elif W > LANES:
        assert W % LANES == 0, (W, D)
        reps = W // LANES
        cos = jnp.concatenate([cos] * reps, axis=1)
        sin = jnp.concatenate([sin] * reps, axis=1)
    if inverse:
        sin = -sin
    if scale is not None:
        cos = cos * scale
        sin = sin * scale
    return x.astype(jnp.float32) * cos + _rope_swap(x, D) * sin


def _mask(s_shape, i_q, i_kv, block_q, block_k, causal, seq_len, window=0,
          q_off=0):
    """q_off: ABSOLUTE position of query row 0 — 0 for self-attention (all
    training kernels); the chunk's cache offset for the rectangular
    continuation-prefill kernel (ops/flash_prefill.py), whose queries sit at
    positions q_off..q_off+S-1 against keys 0..seq_len-1."""
    col = jax.lax.broadcasted_iota(jnp.int32, s_shape, 1) + i_kv * block_k
    m = col < seq_len
    if causal:
        row = (jax.lax.broadcasted_iota(jnp.int32, s_shape, 0)
               + i_q * block_q + q_off)
        m = jnp.logical_and(m, col <= row)
        if window:
            # sliding window: query t attends keys in (t-window, t]
            m = jnp.logical_and(m, col > row - window)
    return m


def _tile_overlaps_band(i_q, i_kv, block_q, block_k, window, q_off=0):
    """Whether tile (i_q, i_kv) contains ANY in-window element: its largest
    column must exceed its smallest row minus the window."""
    return (i_kv + 1) * block_k - 1 > i_q * block_q + q_off - window


def _band_crosses_tile(i_q, i_kv, block_q, block_k, window, q_off=0):
    """Whether the window's LOWER boundary cuts through tile (i_q, i_kv)
    (some element falls below the band): smallest column <= largest row −
    window."""
    return i_kv * block_k <= (i_q + 1) * block_q - 1 + q_off - window


# ---------------------------------------------------------------------------
# single-tile fast path (T_pad fits one block — every ViT config: T <= 256)
#
# With one KV tile the online-softmax machinery (running m/l scratch, acc
# rescale) is pure overhead: softmax reduces in one pass, and the backward
# needs no cross-tile accumulation so dq/dk/dv come out of ONE kernel that
# recomputes p once (the two-kernel general path recomputes it twice) and
# computes di = rowsum(out*dout) in-kernel instead of streaming broadcast
# (B, NH, T, 128) di arrays from HBM.
# ---------------------------------------------------------------------------

# The six kernel bodies below are the ONE set of flash tile kernels for BOTH
# the MHA and the GQA stacks (round-3 verdict item 8: band/rope/masking and
# the phase-split tile math must exist once).  They are parameterized by the
# GQA geometry — QH query heads per grid cell, R = queries per KV head, KVB
# distinct KV heads per 128-lane block, `chunk`-sized phase-split head
# chunks — and MHA instantiates them at the degenerate point QH=G, R=1,
# KVB=G, chunk=G, which reproduces the previous MHA kernel bodies
# op-for-op (the kv slice equals the query slice and _chunks(G, G) is one
# chunk).  flash_attention_gqa.py imports these and supplies its own
# drivers/specs (grid over kv-blocks, phantom-lane padding, tuned chunks).

def _chunks(QH: int, chunk: int):
    return [range(c, min(c + chunk, QH)) for c in range(0, QH, chunk)]



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


def _fwd_single(qkv, num_heads, sm_scale, causal, seq_len, interpret,
                window=0, rope=False, rope_base=10000.0):
    B, T, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    G = _heads_per_block_single(D, num_heads)
    W = G * D
    n_hblk = num_heads // G
    spec = lambda off: pl.BlockSpec((1, T, W), lambda b, h, off=off: (b, 0, off + h),
                                    memory_space=pltpu.VMEM)
    kw = dict(sm_scale=sm_scale, causal=causal, seq_len=seq_len, T=T,
              QH=G, R=1, D=D, chunk=G, window=window, rope=rope)
    if rope:
        kern = functools.partial(_fwd_single_kernel, **kw)
        tab_ops = (_rope_table(T, D, rope_base, qkv.dtype),)
        tab_specs = [_rope_tab_spec(T, lambda b, h: (0, 0))]
    else:
        kern = _no_tab(_fwd_single_kernel, 3, 1, **kw)
        tab_ops, tab_specs = (), []
    out, lse = pl.pallas_call(
        kern,
        grid=(B, n_hblk),
        in_specs=[spec(0), spec(n_hblk), spec(2 * n_hblk)] + tab_specs,
        out_specs=(
            pl.BlockSpec((1, T, W), lambda b, h: (b, 0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, T, LANES), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
                   jax.ShapeDtypeStruct((B, num_heads, T, LANES), jnp.float32)),
        compiler_params=_sems(rope, "parallel", "parallel"),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * num_heads * T * T * D),
            bytes_accessed=int(4 * B * T * C3 + 4 * B * T * C),
            transcendentals=int(B * num_heads * T * T)),
        interpret=interpret,
    )(qkv, qkv, qkv, *tab_ops)
    return out, lse


def _bwd_single(qkv, num_heads, out, lse, do, sm_scale, causal, seq_len,
                interpret, window=0, rope=False, rope_base=10000.0):
    B, T, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    G = _heads_per_block_single(D, num_heads)
    W = G * D
    n_hblk = num_heads // G
    spec = lambda off: pl.BlockSpec((1, T, W), lambda b, h, off=off: (b, 0, off + h),
                                    memory_space=pltpu.VMEM)
    c_spec = pl.BlockSpec((1, T, W), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, G, T, LANES), lambda b, h: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    kw = dict(sm_scale=sm_scale, causal=causal, seq_len=seq_len, T=T,
              QH=G, R=1, D=D, KVB=G, chunk=G, window=window, rope=rope)
    if rope:
        kern = functools.partial(_bwd_single_kernel, **kw)
        tab_ops = (_rope_table(T, D, rope_base, qkv.dtype),)
        tab_specs = [_rope_tab_spec(T, lambda b, h: (0, 0))]
    else:
        kern = _no_tab(_bwd_single_kernel, 6, 1, **kw)
        tab_ops, tab_specs = (), []
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(B, n_hblk),
        in_specs=[spec(0), spec(n_hblk), spec(2 * n_hblk), c_spec, c_spec,
                  lse_spec] + tab_specs,
        out_specs=(c_spec, c_spec, c_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((B, T, C), qkv.dtype)
                        for _ in range(3)),
        compiler_params=_sems(rope, "parallel", "parallel"),
        interpret=interpret,
    )(qkv, qkv, qkv, out, do, lse, *tab_ops)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, tq_ref, tk_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
                *, sm_scale, causal, block_q, block_k, n_kv, seq_len, T,
                QH, R, D, chunk, window=0, rope=False, q_off=0):
    i_q, i_kv = pl.program_id(2), pl.program_id(3)

    @pl.when(i_kv == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    run = ((i_q * block_q + block_q - 1 + q_off >= i_kv * block_k)
           if causal else True)
    if window:
        run = jnp.logical_and(
            run, _tile_overlaps_band(i_q, i_kv, block_q, block_k, window,
                                     q_off))

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

        mxu_lsum = FWD_MXU_LSUM
        ones_t = (jnp.ones((block_k, LANES), vf.dtype) if mxu_lsum else None)

        def body(masked: bool):
            if masked:
                msk = _mask((block_q, block_k), i_q, i_kv, block_q, block_k,
                            causal, seq_len, window, q_off)
            for hs in _chunks(QH, chunk):
                ss = []
                for g in hs:
                    kv = slice((g // R) * D, (g // R + 1) * D)
                    ss.append(jax.lax.dot_general(
                        qf[:, g * D:(g + 1) * D], kf[:, kv],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
                if FWD_SPLITMAX:
                    sms, mns = [], []
                    for i, g in enumerate(hs):
                        s = (jnp.where(msk, ss[i], MASK_VALUE) if masked
                             else ss[i])
                        m_curr = jnp.max(s, axis=1, keepdims=True)
                        m_next = jnp.maximum(m_scr[g], m_curr)
                        sms.append(s)
                        mns.append(m_next)
                    ss = sms
                ps, alphas, lps = [], [], []
                for i, g in enumerate(hs):
                    if FWD_SPLITMAX:
                        s = ss[i]
                        m_prev, l_prev = m_scr[g], l_scr[g]
                        m_next = mns[i]
                        alpha = jnp.exp(m_prev - m_next)
                        p = jnp.exp(s - m_next[:, :1])
                        m_scr[g] = m_next
                    else:
                        s = (jnp.where(msk, ss[i], MASK_VALUE) if masked
                             else ss[i])
                        m_prev, l_prev = m_scr[g], l_scr[g]
                        if FWD_DIAG == "nomax":     # timing isolation only
                            m_next = jnp.zeros_like(m_prev)
                            alpha = jnp.ones_like(m_prev)
                            p = jnp.exp(s * 0.01)
                        elif FWD_DIAG == "noexp":   # timing isolation only
                            m_curr = jnp.max(s, axis=1, keepdims=True)
                            m_next = jnp.maximum(m_prev, m_curr)
                            alpha = (m_prev - m_next) * 0.01 + 1.0
                            p = (s - m_next[:, :1]) * 0.01
                        else:
                            m_curr = jnp.max(s, axis=1, keepdims=True)
                            m_next = jnp.maximum(m_prev, m_curr)
                            alpha = jnp.exp(m_prev - m_next)
                            p = jnp.exp(s - m_next[:, :1])
                        m_scr[g] = m_next
                    if mxu_lsum:
                        # the row-sum of p rides the MXU in the output phase
                        # (a p @ ones dot landing lane-broadcast) instead of
                        # a cross-lane VPU reduce here — the VPU phase keeps
                        # only exp/max work.  p is cast ONCE to the pv dtype
                        # so numerator and denominator see the same rounding.
                        ps.append(p.astype(vf.dtype))
                        lps.append(l_prev)
                    else:
                        l_scr[g] = alpha * l_prev + jnp.sum(p, axis=1,
                                                            keepdims=True)
                        ps.append(p)
                    alphas.append(alpha)
                for i, g in enumerate(hs):
                    kv = slice((g // R) * D, (g // R + 1) * D)
                    if mxu_lsum:
                        lsum = jax.lax.dot_general(
                            ps[i], ones_t, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        l_scr[g] = alphas[i] * lps[i] + lsum
                        pv = jax.lax.dot_general(
                            ps[i], vf[:, kv], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    else:
                        pv = jax.lax.dot_general(
                            ps[i].astype(vf.dtype), vf[:, kv],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                    acc_scr[g] = acc_scr[g] * alphas[i][:, :1] + pv

        has_pad = seq_len != T
        if FWD_DIAG == "skip":      # timing isolation: no tile compute
            pass
        elif not causal and not has_pad:
            body(masked=False)
        else:
            edge = False
            if causal:
                edge = i_q * block_q + q_off < (i_kv + 1) * block_k
            if window:
                edge = jnp.logical_or(edge, _band_crosses_tile(
                    i_q, i_kv, block_q, block_k, window, q_off))
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


def _qkv_specs(n_hblk, block_q, block_k, W, q_grid_dim, kv_grid_dim):
    """Views into packed (B, T_pad, 3C): head-block hb covers channels
    [hb·W, (hb+1)·W) in each of the Q/K/V thirds; W = G·D = 128."""
    def at(t_dim, off):
        def idx(b, h, i, j):
            t = (i, j)[t_dim]
            return (b, t, off + h)
        return idx

    q_spec = pl.BlockSpec((1, block_q, W), at(q_grid_dim, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, W), at(kv_grid_dim, n_hblk),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, block_k, W), at(kv_grid_dim, 2 * n_hblk),
                          memory_space=pltpu.VMEM)
    return q_spec, k_spec, v_spec


def _fwd(qkv, num_heads, sm_scale, causal, seq_len, block_q, block_k,
         interpret, window=0, rope=False, rope_base=10000.0):
    B, T, C3 = qkv.shape
    if T <= block_q and T <= block_k:
        return _fwd_single(qkv, num_heads, sm_scale, causal, seq_len,
                           interpret, window, rope, rope_base)
    C = C3 // 3
    D = C // num_heads
    G = _heads_per_block_multi_fwd(D, num_heads)
    W = G * D
    n_hblk = num_heads // G
    n_q, n_kv = T // block_q, T // block_k
    grid = (B, n_hblk, n_q, n_kv)
    kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q,
              block_k=block_k, n_kv=n_kv, seq_len=seq_len, T=T, QH=G, R=1,
              D=D, chunk=G, window=window, rope=rope)
    if rope:
        kern = functools.partial(_fwd_kernel, **kw)
        tab_ops = (_rope_table(T, D, rope_base, qkv.dtype),) * 2
        tab_specs = [_rope_tab_spec(block_q, lambda b, h, i, j: (i, 0)),
                     _rope_tab_spec(block_k, lambda b, h, i, j: (j, 0))]
    else:
        kern = _no_tab(_fwd_kernel, 3, 2, **kw)
        tab_ops, tab_specs = (), []
    q_spec, k_spec, v_spec = _qkv_specs(n_hblk, block_q, block_k, W, 0, 1)
    out, lse = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec] + tab_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, W), lambda b, h, i, j: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, block_q, LANES),
                         lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
                   jax.ShapeDtypeStruct((B, num_heads, T, LANES), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((G, block_q, LANES), jnp.float32),
                        pltpu.VMEM((G, block_q, LANES), jnp.float32),
                        pltpu.VMEM((G, block_q, D), jnp.float32)],
        compiler_params=_sems(rope, "parallel", "parallel", "parallel",
                              "arbitrary"),
        cost_estimate=pl.CostEstimate(
            flops=int(4 * B * num_heads * T * T * D * (0.5 if causal else 1.0)),
            bytes_accessed=int(4 * B * T * C3 + 4 * B * T * C),
            transcendentals=int(B * num_heads * T * T)),
        interpret=interpret,
    )(qkv, qkv, qkv, *tab_ops)
    return out, lse


# ---------------------------------------------------------------------------
# backward
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




def _bwd_parts(qkv, num_heads, out, lse, do, sm_scale, causal, seq_len,
               block_q, block_k, interpret, window=0, rope=False,
               rope_base=10000.0):
    """Backward returning (dq, dk, dv) as separate (B, T, C) arrays — callers
    that consume the packed layout concatenate; the fused qkv+attention op
    (ops/fused_qkv_attention.py) feeds them straight into the projection
    backward and never materializes the packed gradient."""
    B, T, C3 = qkv.shape
    if T <= block_q and T <= block_k:
        return _bwd_single(qkv, num_heads, out, lse, do, sm_scale, causal,
                           seq_len, interpret, window, rope, rope_base)
    C = C3 // 3
    D = C // num_heads
    # head-group policy (measured, see BWD_VMEM_LIMIT note): prefer the G=4
    # phase-split at whichever G the combined single-pass kernel still fits
    # the 32 MB stack; when combined fits at NO group size, the dKV/dQ pair
    # runs at the large group (T=4096 pair: 83.4k at G=4 vs 82.5k at G=2)
    tab_bytes_probe = 2 * T * 2 * LANES * qkv.dtype.itemsize if rope else 0
    G_big = _heads_per_block_multi_fwd(D, num_heads)
    use_combined = False
    G = G_big
    for g in dict.fromkeys((G_big, _heads_per_block(D))):
        if _combined_bwd_est(g, T, D, block_q, block_k, qkv.dtype.itemsize,
                             tab_bytes_probe) <= COMBINED_BWD_VMEM_LIMIT:
            G, use_combined = g, True
            break
    W = G * D
    n_hblk = num_heads // G
    n_q, n_kv = T // block_q, T // block_k
    # di[b,h,t] = Σ_d out[b,t,h,d]·do[b,t,h,d] is recomputed inside each
    # kernel from the out/do tiles (one VPU rowsum per tile) — the
    # alternative, materializing di in the (B, H, T, 128) lane-broadcast
    # layout the row specs require, cost ~400 MB of HBM write+read per
    # layer at GPT-2 B=32

    semantics = _sems(rope, "parallel", "parallel", "parallel",
                      "arbitrary", vmem=BWD_VMEM_LIMIT)

    # dKV pass: grid (B, hblk, kv, q) — q is the sequential axis
    q_spec, k_spec, v_spec = _qkv_specs(n_hblk, block_q, block_k, W,
                                        q_grid_dim=1, kv_grid_dim=0)
    do_spec = pl.BlockSpec((1, block_q, W), lambda b, h, i, j: (b, j, h),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, G, block_q, LANES),
                            lambda b, h, i, j: (b, h, j, 0),
                            memory_space=pltpu.VMEM)
    kv_out_spec = pl.BlockSpec((1, block_k, W), lambda b, h, i, j: (b, i, h),
                               memory_space=pltpu.VMEM)

    tab = _rope_table(T, D, rope_base, qkv.dtype) if rope else None

    if use_combined:
        # combined single-pass backward: dq accumulates in a whole-sequence
        # VMEM scratch; p computed once per tile instead of twice
        dq_out_spec = pl.BlockSpec((1, T, W), lambda b, h, i, j: (b, 0, h),
                                   memory_space=pltpu.VMEM)
        # dq accumulates ACROSS grid dim 2 (the kv sweep), so that dim must
        # be 'arbitrary' (sequential): on megacore parts Mosaic may split a
        # 'parallel' dim across cores, each with a private dq scratch —
        # one core would write a partial dq, the other's scratch is never
        # flushed.  The separate dKV/dQ kernels below only accumulate across
        # their innermost axis and keep the wider 'parallel' declaration.
        combined_semantics = _sems(rope, "parallel", "parallel",
                                   "arbitrary", "arbitrary",
                                   vmem=BWD_VMEM_LIMIT)
        kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q,
                  block_k=block_k, n_kv=n_kv, n_q=n_q, seq_len=seq_len,
                  T=T, QH=G, R=1, D=D, KVB=G, chunk=G, window=window,
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
            grid=(B, n_hblk, n_kv, n_q),
            in_specs=[q_spec, k_spec, v_spec, do_spec, row_spec, do_spec]
                     + tab_specs,
            out_specs=(dq_out_spec, kv_out_spec, kv_out_spec),
            out_shape=tuple(jax.ShapeDtypeStruct((B, T, C), qkv.dtype)
                            for _ in range(3)),
            scratch_shapes=[pltpu.VMEM((G, T, D), jnp.float32),
                            pltpu.VMEM((G, block_k, D), jnp.float32),
                            pltpu.VMEM((G, block_k, D), jnp.float32)],
            compiler_params=combined_semantics,
            interpret=interpret,
        )(qkv, qkv, qkv, do, lse, out, *tab_ops)
        return dq, dk, dv

    kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q,
              block_k=block_k, n_q=n_q, seq_len=seq_len, T=T, QH=G, R=1,
              D=D, KVB=G, chunk=G, window=window, rope=rope)
    if rope:
        kern = functools.partial(_bwd_dkv_kernel, **kw)
        tab_ops = (tab, tab)
        # grid (B, hblk, kv, q): grid dim 3 (j) is the q-block index
        tab_specs = [_rope_tab_spec(block_q, lambda b, h, i, j: (j, 0)),
                     _rope_tab_spec(block_k, lambda b, h, i, j: (i, 0))]
    else:
        kern = _no_tab(_bwd_dkv_kernel, 6, 2, **kw)
        tab_ops, tab_specs = (), []
    dk, dv = pl.pallas_call(
        kern,
        grid=(B, n_hblk, n_kv, n_q),
        in_specs=[q_spec, k_spec, v_spec, do_spec, row_spec, do_spec]
                 + tab_specs,
        out_specs=(kv_out_spec, kv_out_spec),
        out_shape=(jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
                   jax.ShapeDtypeStruct((B, T, C), qkv.dtype)),
        scratch_shapes=[pltpu.VMEM((G, block_k, D), jnp.float32),
                        pltpu.VMEM((G, block_k, D), jnp.float32)],
        compiler_params=semantics,
        interpret=interpret,
    )(qkv, qkv, qkv, do, lse, out, *tab_ops)

    # dQ pass: grid (B, hblk, q, kv) — kv is the sequential axis
    q_spec2, k_spec2, v_spec2 = _qkv_specs(n_hblk, block_q, block_k, W,
                                           q_grid_dim=0, kv_grid_dim=1)
    do_spec2 = pl.BlockSpec((1, block_q, W), lambda b, h, i, j: (b, i, h),
                            memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, G, block_q, LANES),
                             lambda b, h, i, j: (b, h, i, 0),
                             memory_space=pltpu.VMEM)
    kw = dict(sm_scale=sm_scale, causal=causal, block_q=block_q,
              block_k=block_k, n_kv=n_kv, seq_len=seq_len, T=T, QH=G, R=1,
              D=D, chunk=G, window=window, rope=rope)
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
        grid=(B, n_hblk, n_q, n_kv),
        in_specs=[q_spec2, k_spec2, v_spec2, do_spec2, row_spec2, do_spec2]
                 + tab_specs,
        out_specs=do_spec2,
        out_shape=jax.ShapeDtypeStruct((B, T, C), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((G, block_q, D), jnp.float32)],
        compiler_params=semantics,
        interpret=interpret,
    )(qkv, qkv, qkv, do, lse, out, *tab_ops)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public entry points
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
def _flash_packed(qkv, num_heads, sm_scale, causal, seq_len, block_q, block_k,
                  interpret, window=0, rope=False, rope_base=10000.0):
    out, _ = _fwd(qkv, num_heads, sm_scale, causal, seq_len, block_q, block_k,
                  interpret, window, rope, rope_base)
    return out


def _flash_packed_fwd(qkv, num_heads, sm_scale, causal, seq_len, block_q,
                      block_k, interpret, window=0, rope=False,
                      rope_base=10000.0):
    out, lse = _fwd(qkv, num_heads, sm_scale, causal, seq_len, block_q,
                    block_k, interpret, window, rope, rope_base)
    return out, (qkv, out, lse)


def _flash_packed_bwd(num_heads, sm_scale, causal, seq_len, block_q, block_k,
                      interpret, window, rope, rope_base, res, do):
    qkv, out, lse = res
    dq, dk, dv = _bwd_parts(qkv, num_heads, out, lse, do, sm_scale, causal,
                            seq_len, block_q, block_k, interpret, window,
                            rope, rope_base)
    return (jnp.concatenate([dq, dk, dv], axis=-1),)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


def flash_attention_qkv(qkv: jax.Array, num_heads: int, causal: bool = True,
                        sm_scale: Optional[float] = None,
                        block_q: int = DEFAULT_BLOCK_Q,
                        block_k: int = DEFAULT_BLOCK_K,
                        interpret: bool = False,
                        window: int = 0, rope: bool = False,
                        rope_base: float = 10000.0) -> jax.Array:
    """Flash attention over packed qkv (B, T, 3C) -> (B, T, C).

    Zero-copy head slicing straight from the packed buffer; T padded to a
    block multiple internally (padded key columns masked, padded query rows
    sliced off).  Falls back to the dense XLA path for geometries the packed
    kernel can't tile (see `supports`).

    window > 0 (requires causal) restricts each query t to keys in
    (t-window, t] — sliding-window attention.  Tiles wholly outside the band
    are skipped at the predicate level in forward AND backward, so attention
    compute scales with T·window instead of T².

    rope=True applies rotary position embeddings (positions 0..T-1) to the
    q/k thirds INSIDE the kernels (`_rope_rotate`): the rotation happens on
    tiles already in VMEM using a streamed (T, 256) [cos|sin] position
    table (`_rope_table` — computed once per step in XLA; in-kernel iota
    trig measured 48 ms/step at GPT-2 124M B=32, the table stream ~3 ms),
    the backward recompute rotates the same way, and the dq/dk gradients
    are inverse-rotated on the way out — so the caller passes UNROTATED
    qkv and receives gradients in unrotated space.  Replaces the
    ~42 ms/step of full-width apply_rope HBM passes + packed concats."""
    assert causal or not window, "sliding-window attention is causal-only"
    B, T, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    if not supports(num_heads, D):
        Hp = padded_num_heads(num_heads, D)
        if Hp is None:
            from . import basic
            if rope:
                # non-tileable geometry: rotate explicitly, same math
                from .rope import rope_qk
                q, k = rope_qk(qkv[..., :C], qkv[..., C:2 * C],
                               jnp.arange(T), num_heads, num_heads)
                qkv = jnp.concatenate([q, k, qkv[..., 2 * C:]], axis=-1)
            out, _ = basic.attention_dense(qkv, num_heads, causal=causal,
                                           window=window)
            return out
        # phantom-head relayout (odd head counts, e.g. 25): zero-pad each
        # packed third, run the kernel at Hp heads, slice the real channels
        Cp = Hp * D
        pad = jnp.zeros((B, T, Cp - C), qkv.dtype)
        qkv = jnp.concatenate(
            [t for i in range(3) for t in (qkv[:, :, i * C:(i + 1) * C], pad)],
            axis=-1)
        out = flash_attention_qkv(qkv, Hp, causal=causal, sm_scale=sm_scale,
                                  block_q=block_q, block_k=block_k,
                                  interpret=interpret, window=window,
                                  rope=rope, rope_base=rope_base)
        return out[:, :, :C]
    if sm_scale is None:
        sm_scale = 1.0 / (D ** 0.5)
    x, block_q, block_k = prep_blocks(qkv, block_q, block_k)
    out = _flash_packed(x, num_heads, float(sm_scale), causal, T, block_q,
                        block_k, interpret, window, rope, float(rope_base))
    return out[:, :T, :] if x.shape[1] != T else out


def prep_blocks(qkv: jax.Array, block_q: int, block_k: int):
    """Pad T to a block multiple and clamp blocks.  A T that fits one tile is
    passed through raw (block dim == array dim satisfies Mosaic tiling): no
    HBM pad/slice round trip, and — bidirectional — no mask pass at all."""
    T = qkv.shape[1]
    if T <= max(block_q, block_k):
        return qkv, max(T, block_q), max(T, block_k)
    T_pad = _ceil_to(T, LANES)
    block_q, block_k = min(block_q, T_pad), min(block_k, T_pad)
    T_pad = _ceil_to(T_pad, max(block_q, block_k))
    if T_pad != T:
        qkv = jnp.pad(qkv, ((0, 0), (0, T_pad - T), (0, 0)))
    return qkv, block_q, block_k


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    causal: bool = False,
                    sm_scale: Optional[float] = None,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False,
                    window: int = 0) -> jax.Array:
    """Generic (B, H, T, D) entry — packs to the qkv layout and dispatches.
    Prefer flash_attention_qkv on the training hot path (no repacking)."""
    B, H, T, D = q.shape

    def pack(x):
        return x.transpose(0, 2, 1, 3).reshape(B, T, H * D)

    qkv = jnp.concatenate([pack(q), pack(k), pack(v)], axis=-1)
    out = flash_attention_qkv(qkv, H, causal=causal, sm_scale=sm_scale,
                              block_q=block_q, block_k=block_k,
                              interpret=interpret, window=window)
    return out.reshape(B, T, H, D).transpose(0, 2, 1, 3)
