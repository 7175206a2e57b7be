"""Pipeline parallelism — GPipe and 1F1B schedules over a "pipe" mesh axis.

Beyond the reference's capability set (SURVEY.md §2 row 26) — the third
parallelism axis after data (data_parallel.py) and tensor (tensor_parallel.py).

Design: the stacked (L, ...) block parameters are sliced over the pipe axis
(L/S layers per stage).  Both schedules run as a `lax.scan` of synchronous
ticks inside shard_map; activations hop to the next stage via `ppermute`
(neighbor-only, rides ICI).  Works for BOTH model families: vit mode
(patch-embed encode, classifier head) and gpt mode (token encode, weight-tied
vocab head, per-token CE — the reference's own model, rusty_vit.rs:336).

Stage work is gated with `lax.cond` on the stage index, so only stage 0 runs
the encoder and only stage S-1 runs the head+loss — a `jnp.where(stage==0,..)`
select (round 1) made EVERY stage patch-embed every tick and throw the result
away.

Schedules:
  * GPipe (`schedule="gpipe"`): forward scan over M + S - 1 ticks, autodiff
    straight through scan+ppermute (the transpose of a permutation is the
    inverse permutation, so the backward pass is automatically the reverse
    pipeline).  Activation memory grows with the number of microbatches.
  * 1F1B (`schedule="1f1b"`): one scan over M + 2S - 1 ticks where every
    stage does one forward micro-step AND one backward micro-step per tick —
    the synchronous form of the 1F1B steady state.  Backward recomputes the
    stage forward from a stashed input activation (jax.vjp per microbatch),
    so activation memory is bounded by the pipeline depth (a (2S, Bm, T, C)
    circular buffer), NOT by the microbatch count — the reason 1F1B exists.
  * Interleaved 1F1B (`schedule="1f1b-interleaved"`, `virtual_stages=V`):
    Megatron-style virtual pipeline — each device holds V non-contiguous
    layer chunks, fill/drain ticks cost 1/V of a stage, bubble shrinks ~V×.
    Needs `place_pp_params_interleaved` (the L axis is permuted so the
    contiguous pipe-axis slices hold the right chunks).

Collective-transpose care (same class of bug as tensor_parallel.reduce_out):
the final loss combine uses psum-forward/identity-backward, and replicated
parameters' gradients (embeddings/head/final-LN, which only one stage's
compute actually uses) are summed over the pipe axis after the fact.

Composable with data parallelism on a 2-D (data, pipe) mesh: batch sharded
over "data", every pipe stage sees its data shard.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..config import ViTConfig
from .. import params as PRM
from ..models import model as M
from ..ops import basic, optimizer as opt
from .tensor_parallel import reduce_out


def make_mesh_dp_pp(dp: int, pp: int, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()[:dp * pp]
    assert len(devices) == dp * pp
    return Mesh(np.asarray(devices).reshape(dp, pp),
                axis_names=("data", "pipe"))


def pp_param_specs(cfg: ViTConfig):
    """Block tensors sliced over the pipe axis; everything else replicated.
    MoE configs: the stacked (L, E, C) router rides the pipe slice with the
    expert slabs (it is a per-layer leaf like the rest of the block)."""
    specs = {k: P() for k in PRM.tensor_order(cfg) if k not in M.BLOCK_KEYS}
    specs.update({k: P("pipe") for k in M.BLOCK_KEYS})
    if cfg.is_moe:
        specs["routerw"] = P("pipe")
    return specs


def _mode_fns(p, cfg: ViTConfig, stage_cfg: ViTConfig):
    """(encode, apply, head_loss) closures dispatching on cfg.mode.

    gpt head is weight-tied to wte with no bias (rusty_vit.rs:336) and the
    loss is mean per-token CE (rusty_vit.rs:342-347); vit head is the
    pooled classifier."""
    dtype = jnp.dtype(cfg.dtype)
    causal = cfg.mode == "gpt"

    def encode(pp_, xb):
        # takes params explicitly so jax.vjp in the 1F1B backward captures
        # the embedding gradients (a closure over the outer p would not)
        if cfg.mode == "gpt":
            return M.gpt_encode(xb, pp_, dtype, rope=cfg.pos_emb == "rope")
        return M.vit_encode(xb, pp_, cfg).astype(dtype)

    def apply(pp_, x):
        """Stage trunk; returns (y, aux) — aux is the stage's mean weighted
        MoE router loss over its LOCAL layers (zero scalar when dense)."""
        return M.transformer(x, pp_, stage_cfg, causal=causal,
                             return_aux=True)

    def head_loss(pp_, y, lbl):
        lnf = basic.layernorm_cv(y, pp_["lnfw"], pp_["lnfb"])
        if cfg.mode == "gpt":
            logits = basic.linear(lnf, pp_["wte"].astype(dtype), None)
            return jnp.mean(basic.cross_entropy_from_logits(logits, lbl))
        pooled = lnf[:, 0, :] if cfg.pool == "cls" else jnp.mean(lnf, axis=1)
        logits = basic.linear(pooled, pp_["headw"],
                              pp_["headb"]).astype(jnp.float32)
        return jnp.mean(basic.cross_entropy_from_logits(logits, lbl))

    return encode, apply, head_loss


def _act_seq_len(cfg: ViTConfig, inputs) -> int:
    return inputs.shape[1] if cfg.mode == "gpt" else cfg.seq_len


def _pp_loss(p, inputs, labels, cfg: ViTConfig, n_stages: int,
             microbatches: int):
    """GPipe pipelined forward + loss, inside shard_map on the pipe axis."""
    S, Mb = n_stages, microbatches
    stage = jax.lax.axis_index("pipe")
    B = inputs.shape[0]
    Bm = B // Mb
    micro_x = inputs.reshape((Mb, Bm) + inputs.shape[1:])
    micro_y = labels.reshape((Mb, Bm) + labels.shape[1:])
    stage_cfg = cfg.replace(num_layers=cfg.num_layers // S)
    dtype = jnp.dtype(cfg.dtype)
    T = _act_seq_len(cfg, inputs)
    perm = [(i, (i + 1) % S) for i in range(S)]
    encode, apply, head_loss = _mode_fns(p, cfg, stage_cfg)

    def tick(carry, t):
        act, loss_sum, aux_sum = carry
        in_idx = jnp.clip(t, 0, Mb - 1)
        # only stage 0, and only on ticks that inject a real microbatch,
        # pays for the encoder (cond, not select); drain ticks pass through
        x_in = jax.lax.cond(
            jnp.logical_and(stage == 0, t < Mb),
            lambda a: encode(p, jax.lax.dynamic_index_in_dim(
                micro_x, in_idx, 0, keepdims=False)),
            lambda a: a, act)
        y, aux = apply(p, x_in)
        # router aux only counts when a REAL microbatch is in flight on
        # this stage (bubble ticks process garbage activations)
        f = t - stage
        in_flight = jnp.logical_and(f >= 0, f < Mb)
        aux_sum = aux_sum + jnp.where(in_flight, aux, 0.0)
        out_idx = t - (S - 1)
        lbl = jax.lax.dynamic_index_in_dim(
            micro_y, jnp.clip(out_idx, 0, Mb - 1), 0, keepdims=False)
        valid = jnp.logical_and(stage == S - 1,
                                jnp.logical_and(out_idx >= 0, out_idx < Mb))
        # only the last stage pays for the head (for gpt that is the full
        # B*T*V vocab matmul — a select would run it on every stage)
        ml = jax.lax.cond(valid,
                          lambda yy, ll: head_loss(p, yy, ll),
                          lambda yy, ll: jnp.zeros((), jnp.float32), y, lbl)
        loss_sum = loss_sum + ml
        act_next = jax.lax.ppermute(y, "pipe", perm)
        return (act_next, loss_sum, aux_sum), None

    act0 = jnp.zeros((Bm, T, cfg.channels), dtype)
    (_, loss_sum, aux_sum), _ = jax.lax.scan(
        tick, (act0, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
        jnp.arange(Mb + S - 1))
    # CE accumulated on the last stage only; each stage's aux covers its
    # L/S local layers (transformer divides by the STAGE depth), so the
    # pipe sum of aux/S reassembles the full per-layer mean
    return reduce_out(loss_sum + aux_sum / S, "pipe") / Mb


def _pp_1f1b(p, inputs, labels, cfg: ViTConfig, n_stages: int,
             microbatches: int):
    """1F1B: returns (loss, grads) directly — no outer jax.grad.

    Synchronous schedule: stage s runs forward of microbatch f at tick
    t = f + s and backward of microbatch b at tick t = 2S - 1 - s + b, so in
    steady state every stage does one F and one B per tick.  Backward
    recomputes the stage forward under jax.vjp from the stashed input
    activation — in-flight activations are bounded by 2S microbatches."""
    S, Mb = n_stages, microbatches
    stage = jax.lax.axis_index("pipe")
    B = inputs.shape[0]
    Bm = B // Mb
    micro_x = inputs.reshape((Mb, Bm) + inputs.shape[1:])
    micro_y = labels.reshape((Mb, Bm) + labels.shape[1:])
    stage_cfg = cfg.replace(num_layers=cfg.num_layers // S)
    dtype = jnp.dtype(cfg.dtype)
    T = _act_seq_len(cfg, inputs)
    C = cfg.channels
    fwd_perm = [(i, (i + 1) % S) for i in range(S)]
    bwd_perm = [(i, (i - 1) % S) for i in range(S)]
    encode, apply, head_loss = _mode_fns(p, cfg, stage_cfg)
    DEPTH = 2 * S     # max in-flight microbatches per stage: gap 2S-1-2s ticks

    def stage_out(pp_, a, idx, with_head=True):
        """The whole per-stage computation for ONE microbatch, as a function
        of (params, input activation) so one jax.vjp gives both dp and dx.
        Stage 0's input is the raw microbatch (encode inside); the last
        stage's outputs include the loss.  with_head=False skips the head on
        forward ticks — it is recomputed under vjp on the backward tick.

        MoE: the stage's router aux (mean over its L/S local layers) rides
        the scalar output as aux/S on EVERY stage — the backward seeds its
        cotangent to 1.0 everywhere, so d(aux)/d(router/experts) lands in
        this stage's dp and d(aux)/d(x_in) propagates to earlier stages
        through da.  Summed over the pipe, Σ_s aux_s/S is the same
        full-depth per-layer mean the GPipe tick accumulates (_pp_loss)."""
        x_in = jax.lax.cond(
            stage == 0,
            lambda aa: encode(pp_, jax.lax.dynamic_index_in_dim(
                micro_x, idx, 0, keepdims=False)),
            lambda aa: aa, a)
        y, aux = apply(pp_, x_in)
        if not with_head:
            return y, jnp.zeros((), jnp.float32)
        lbl = jax.lax.dynamic_index_in_dim(micro_y, idx, 0, keepdims=False)
        ml = jax.lax.cond(stage == S - 1,
                          lambda yy: head_loss(pp_, yy, lbl),
                          lambda yy: jnp.zeros((), jnp.float32), y)
        return y, ml + aux / S

    zero_grads = jax.tree_util.tree_map(
        lambda v: jnp.zeros(v.shape, jnp.float32), p)

    def tick(carry, t):
        act_recv, g_recv, buf, dp_acc, loss_sum = carry

        # ---- forward micro-step: f = t - stage ----
        f = t - stage
        valid_f = jnp.logical_and(f >= 0, f < Mb)
        fc = jnp.clip(f, 0, Mb - 1)

        def do_fwd(a):
            y, _ = stage_out(p, a, fc, with_head=False)
            return y

        y = jax.lax.cond(valid_f, do_fwd,
                         lambda a: jnp.zeros((Bm, T, C), dtype), act_recv)
        # stash the INPUT activation for the recompute-backward
        buf = jax.lax.cond(
            valid_f,
            lambda bf: jax.lax.dynamic_update_index_in_dim(
                bf, act_recv, fc % DEPTH, 0),
            lambda bf: bf, buf)

        # ---- backward micro-step: b = t - (2S - 1 - stage) ----
        b = t - (2 * S - 1 - stage)
        valid_b = jnp.logical_and(b >= 0, b < Mb)
        bc = jnp.clip(b, 0, Mb - 1)

        def do_bwd(args):
            g_in, bf = args
            a_saved = jax.lax.dynamic_index_in_dim(bf, bc % DEPTH, 0,
                                                   keepdims=False)
            (y_r, ml), vjp = jax.vjp(
                lambda pp_, aa: stage_out(pp_, aa, bc), p, a_saved)
            # cotangents: last stage seeds the loss into y's head; every
            # stage seeds the scalar (1.0) — for dense stages the non-last
            # scalar is a constant 0 (no flow), for MoE it carries the
            # stage-local router aux gradient
            is_last = stage == S - 1
            g_y = jnp.where(is_last, jnp.zeros_like(g_in), g_in)
            dp, da = vjp((g_y.astype(y_r.dtype), jnp.float32(1.0)))
            return dp, da, ml

        def skip_bwd(args):
            g_in, _ = args
            return zero_grads, jnp.zeros_like(g_in), jnp.zeros((), jnp.float32)

        dp, da, ml = jax.lax.cond(valid_b, do_bwd, skip_bwd, (g_recv, buf))
        dp_acc = jax.tree_util.tree_map(jnp.add, dp_acc, dp)
        loss_sum = loss_sum + ml      # nonzero only on the last stage

        act_next = jax.lax.ppermute(y, "pipe", fwd_perm)
        g_next = jax.lax.ppermute(da.astype(dtype), "pipe", bwd_perm)
        return (act_next, g_next, buf, dp_acc, loss_sum), None

    act0 = jnp.zeros((Bm, T, C), dtype)
    g0 = jnp.zeros((Bm, T, C), dtype)
    buf0 = jnp.zeros((DEPTH, Bm, T, C), dtype)
    carry0 = (act0, g0, buf0, zero_grads, jnp.zeros((), jnp.float32))
    (_, _, _, dp_acc, loss_sum), _ = jax.lax.scan(
        tick, carry0, jnp.arange(Mb + 2 * S - 1))
    inv = 1.0 / Mb
    grads = jax.tree_util.tree_map(lambda g: g * inv, dp_acc)
    return reduce_out(loss_sum, "pipe") * inv, grads


def _pp_1f1b_interleaved(p, inputs, labels, cfg: ViTConfig, n_stages: int,
                         virtual: int, microbatches: int):
    """Interleaved 1F1B (Megatron virtual pipeline stages): device d holds
    `virtual` NON-contiguous layer chunks — virtual stage sv = vi·S + d for
    local slot vi — so the pipeline has Sv = S·V stages whose fill/drain
    ticks each cost only 1/V of a device's layers: the bubble shrinks ~V×
    at equal microbatch count.

    Routing is the 1F1B ring run V times around: every tick all V activation
    slots hop to the next device; the wrap (device S-1 → device 0) advances
    the slot index, which in SPMD form is a jnp.roll of the slot axis on
    device 0 only (and the mirror-image roll for gradients on device S-1).
    Chunk slicing happens INSIDE the vjp closure, so each backward
    micro-step scatters its chunk's gradient straight into the full local
    stacked-block gradient."""
    S, V, Mb = n_stages, virtual, microbatches
    Sv = S * V
    stage = jax.lax.axis_index("pipe")
    B = inputs.shape[0]
    Bm = B // Mb
    micro_x = inputs.reshape((Mb, Bm) + inputs.shape[1:])
    micro_y = labels.reshape((Mb, Bm) + labels.shape[1:])
    Lc = cfg.num_layers // Sv           # layers per chunk
    chunk_cfg = cfg.replace(num_layers=Lc)
    dtype = jnp.dtype(cfg.dtype)
    T = _act_seq_len(cfg, inputs)
    C = cfg.channels
    fwd_perm = [(i, (i + 1) % S) for i in range(S)]
    bwd_perm = [(i, (i - 1) % S) for i in range(S)]
    encode, apply, head_loss = _mode_fns(p, cfg, chunk_cfg)
    DEPTH = 2 * Sv

    def chunk_params(pp_full, vi: int):
        return {k: (v[vi * Lc:(vi + 1) * Lc] if k in M.BLOCK_KEYS else v)
                for k, v in pp_full.items()}

    def stage_out(pp_full, a, idx, vi: int, with_head=True):
        pc = chunk_params(pp_full, vi)
        sv = vi * S + stage
        x_in = jax.lax.cond(
            sv == 0,
            lambda aa: encode(pc, jax.lax.dynamic_index_in_dim(
                micro_x, idx, 0, keepdims=False)),
            lambda aa: aa, a)
        y, _ = apply(pc, x_in)   # interleaved 1F1B is dense-only
        if not with_head:
            return y, jnp.zeros((), jnp.float32)
        lbl = jax.lax.dynamic_index_in_dim(micro_y, idx, 0, keepdims=False)
        ml = jax.lax.cond(sv == Sv - 1,
                          lambda yy: head_loss(pc, yy, lbl),
                          lambda yy: jnp.zeros((), jnp.float32), y)
        return y, ml

    zero_grads = jax.tree_util.tree_map(
        lambda v: jnp.zeros(v.shape, jnp.float32), p)

    def tick(carry, t):
        act_recv, g_recv, bufs, dp_acc, loss_sum = carry

        ys = []
        bufs = list(bufs)
        for vi in range(V):
            sv = vi * S + stage
            f = t - sv
            valid_f = jnp.logical_and(f >= 0, f < Mb)
            fc = jnp.clip(f, 0, Mb - 1)
            a_in = act_recv[vi]
            y = jax.lax.cond(
                valid_f,
                lambda a, vi=vi, fc=fc: stage_out(p, a, fc, vi,
                                                  with_head=False)[0],
                lambda a: jnp.zeros((Bm, T, C), dtype), a_in)
            bufs[vi] = jax.lax.cond(
                valid_f,
                lambda bf, a=a_in, fc=fc: jax.lax.dynamic_update_index_in_dim(
                    bf, a, fc % DEPTH, 0),
                lambda bf: bf, bufs[vi])
            ys.append(y)
        y_all = jnp.stack(ys)

        das = []
        for vi in range(V):
            sv = vi * S + stage
            b = t - (2 * Sv - 1 - sv)
            valid_b = jnp.logical_and(b >= 0, b < Mb)
            bc = jnp.clip(b, 0, Mb - 1)

            def do_bwd(args, vi=vi, bc=bc, sv=sv):
                g_in, bf = args
                a_saved = jax.lax.dynamic_index_in_dim(bf, bc % DEPTH, 0,
                                                       keepdims=False)
                (y_r, ml), vjp = jax.vjp(
                    lambda pp_, aa: stage_out(pp_, aa, bc, vi), p, a_saved)
                is_last = sv == Sv - 1
                g_y = jnp.where(is_last, jnp.zeros_like(g_in), g_in)
                g_ml = jnp.where(is_last, 1.0, 0.0).astype(jnp.float32)
                dp, da = vjp((g_y.astype(y_r.dtype), g_ml))
                return dp, da, ml

            def skip_bwd(args):
                g_in, _ = args
                return (zero_grads, jnp.zeros_like(g_in),
                        jnp.zeros((), jnp.float32))

            dp, da, ml = jax.lax.cond(valid_b, do_bwd, skip_bwd,
                                      (g_recv[vi], bufs[vi]))
            dp_acc = jax.tree_util.tree_map(jnp.add, dp_acc, dp)
            loss_sum = loss_sum + ml
            das.append(da)
        da_all = jnp.stack(das).astype(dtype)

        act_ring = jax.lax.ppermute(y_all, "pipe", fwd_perm)
        # wrap dev S-1 -> dev 0 advances the virtual chunk: slot vi -> vi+1
        act_next = jnp.where(stage == 0, jnp.roll(act_ring, 1, axis=0),
                             act_ring)
        g_ring = jax.lax.ppermute(da_all, "pipe", bwd_perm)
        g_next = jnp.where(stage == S - 1, jnp.roll(g_ring, -1, axis=0),
                           g_ring)
        return (act_next, g_next, tuple(bufs), dp_acc, loss_sum), None

    act0 = jnp.zeros((V, Bm, T, C), dtype)
    g0 = jnp.zeros((V, Bm, T, C), dtype)
    bufs0 = tuple(jnp.zeros((DEPTH, Bm, T, C), dtype) for _ in range(V))
    carry0 = (act0, g0, bufs0, zero_grads, jnp.zeros((), jnp.float32))
    (_, _, _, dp_acc, loss_sum), _ = jax.lax.scan(
        tick, carry0, jnp.arange(Mb + 2 * Sv - 1))
    inv = 1.0 / Mb
    grads = jax.tree_util.tree_map(lambda g: g * inv, dp_acc)
    return reduce_out(loss_sum, "pipe") * inv, grads


def make_pp_train_step(cfg: ViTConfig, mesh: Mesh, microbatches: int,
                       schedule: str = "gpipe", virtual_stages: int = 1,
                       accum_steps: int = 1, clip_norm: float = 0.0,
                       return_grad_norm: bool = False):
    """(pp_params, m, v, inputs, labels, step, lr, wd)
    -> (..., loss[, grad_norm]) on a (data, pipe) mesh; batch sharded over
    data, layers over pipe.  schedule: "gpipe" (autodiff through the forward
    scan) or "1f1b" (explicit fwd/bwd interleave, depth-bounded activation
    memory).  accum_steps scans the pipeline over micro-slices of the local
    batch (each slice still splits into ``microbatches`` pipeline
    micro-batches); clip_norm applies the DP path's global-norm clip after
    the data combine (parallel/gradops.py)."""
    S = mesh.shape["pipe"]
    assert not cfg.is_moe or schedule in ("gpipe", "1f1b"), (
        "MoE under pipeline parallelism rides GPipe or 1F1B (the stage_out "
        "scalar carries the router aux with its cotangent seeded on every "
        "stage); the interleaved schedule is dense-only — or use dp/ep "
        "(parallel/expert_parallel.py)")
    assert cfg.num_layers % (S * virtual_stages) == 0, (
        cfg.num_layers, S, virtual_stages)
    assert schedule in ("gpipe", "1f1b", "1f1b-interleaved"), schedule
    assert virtual_stages == 1 or schedule == "1f1b-interleaved"
    specs = pp_param_specs(cfg)

    from . import gradops

    def spmd(p, m, v, inputs, labels, step, lr, wd):
        def lag(p_, x, y):
            if schedule == "gpipe":
                loss_, grads_ = jax.value_and_grad(_pp_loss)(
                    p_, x, y, cfg, S, microbatches)
            elif schedule == "1f1b-interleaved":
                loss_, grads_ = _pp_1f1b_interleaved(
                    p_, x, y, cfg, S, virtual_stages, microbatches)
            else:
                loss_, grads_ = _pp_1f1b(p_, x, y, cfg, S, microbatches)
            # replicated leaves: true grad = sum of per-stage partials
            return loss_, {k: (jax.lax.psum(g, "pipe") if specs[k] == P()
                               else g)
                           for k, g in grads_.items()}

        loss, grads = gradops.accumulate_microbatches(
            lag, p, inputs, labels, accum_steps)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, "data"), grads)
        gnorm = None
        if clip_norm > 0.0 or return_grad_norm:
            gnorm = gradops.global_grad_norm(grads, specs)
        if clip_norm > 0.0:
            scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
            grads = {k: g * scale for k, g in grads.items()}
        p, m, v = opt.adamw_tree(p, grads, m, v, step, lr, weight_decay=wd)
        loss = jax.lax.pmean(loss, "data")
        if return_grad_norm:
            return p, m, v, loss, gnorm
        return p, m, v, loss

    out_tail = (P(), P()) if return_grad_norm else (P(),)
    mapped = shard_map(
        spmd, mesh=mesh,
        in_specs=(dict(specs), dict(specs), dict(specs),
                  P("data"), P("data"), P(), P(), P()),
        out_specs=(dict(specs), dict(specs), dict(specs)) + out_tail,
        check_rep=False)
    return jax.jit(mapped, donate_argnums=(0, 1, 2))


def place_pp_params(params, cfg: ViTConfig, mesh: Mesh):
    specs = pp_param_specs(cfg)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in params.items()}


def interleave_layer_order(L: int, S: int, V: int):
    """Stacked-L permutation for the interleaved schedule: device d must
    hold the layers of virtual stages {v·S + d} in slot order, but
    P("pipe") slices the L axis contiguously — so permute layers so that
    position (d·V + vi)·Lc .. holds global chunk vi·S + d."""
    Lc = L // (S * V)
    order = []
    for d in range(S):
        for vi in range(V):
            c = vi * S + d
            order.extend(range(c * Lc, (c + 1) * Lc))
    return order


def place_pp_params_interleaved(params, cfg: ViTConfig, mesh: Mesh, V: int):
    S = mesh.shape["pipe"]
    order = jnp.asarray(interleave_layer_order(cfg.num_layers, S, V))
    specs = pp_param_specs(cfg)
    return {k: jax.device_put(v[order] if k in M.BLOCK_KEYS else v,
                              NamedSharding(mesh, specs[k]))
            for k, v in params.items()}


def uninterleave_tree(tree, cfg: ViTConfig, S: int, V: int):
    """Undo the interleaved layer permutation (e.g. on gathered gradients
    or before writing a canonical-order checkpoint)."""
    order = np.asarray(interleave_layer_order(cfg.num_layers, S, V))
    inv = np.argsort(order)
    return {k: (np.asarray(v)[inv] if k in M.BLOCK_KEYS else v)
            for k, v in tree.items()}


def init_pp_opt_state(pp_params, mesh: Mesh, cfg: ViTConfig):
    specs = pp_param_specs(cfg)

    def zeros():
        return {k: jax.jit(lambda s=v.shape: jnp.zeros(s, jnp.float32),
                           out_shardings=NamedSharding(mesh, specs[k]))()
                for k, v in pp_params.items()}

    return zeros(), zeros()


# --- Adafactor under PP ------------------------------------------------------
#
# The pipe axis slices the stacked-L block leaves on their LEADING dim, and
# the Adafactor step is exactly invariant to leading-axis sharding (RMS
# scalars per trailing matrix/vector — ops/adafactor.py module doc; the same
# property the expert-parallel variant rides).  So each stage runs the PLAIN
# AF.step on its local (L/S, ...) slice and reproduces the single-device
# update bit-for-bit given the same grads — no shard_axes, no pmeans.

def _af_specs_with_fac(gshapes, pspecs, fac):
    """AF.state_specs with an explicit per-leaf factored decision."""
    from ..ops import adafactor as AF

    def pad(k, nd):
        s = tuple(pspecs[k])
        return s + (None,) * (nd - len(s))

    vr, vc, vf = {}, {}, {}
    for k, v in gshapes.items():
        sp = pad(k, v.ndim)
        if fac[k]:
            vr[k] = P(*sp[:-1])
            vc[k] = P(*(sp[:-2] + sp[-1:]))
            vf[k] = P()
        else:
            vr[k], vc[k] = P(), P()
            vf[k] = P(*sp)
    return AF.AdafactorState(vr, vc, vf, {})


def _af_zeros_with_fac(gshapes, fac):
    from ..ops import adafactor as AF
    vr, vc, vf = {}, {}, {}
    for k, v in gshapes.items():
        if fac[k]:
            vr[k] = jax.ShapeDtypeStruct(v.shape[:-1], jnp.float32)
            vc[k] = jax.ShapeDtypeStruct(v.shape[:-2] + v.shape[-1:],
                                         jnp.float32)
            vf[k] = jax.ShapeDtypeStruct((), jnp.float32)
        else:
            vr[k] = jax.ShapeDtypeStruct((), jnp.float32)
            vc[k] = jax.ShapeDtypeStruct((), jnp.float32)
            vf[k] = jax.ShapeDtypeStruct(v.shape, jnp.float32)
    return AF.AdafactorState(vr, vc, vf, {})


def pp_af_factored(cfg: ViTConfig, min_factor: int = 0):
    """The PP/3-D factored decision: global shapes, ndim-2 block stacks
    forced full-v (see make_pp_train_step_adafactor)."""
    from ..ops import adafactor as AF
    mf = min_factor or AF.MIN_FACTOR
    gshapes = {k: jax.ShapeDtypeStruct(s, jnp.float32)
               for k, s in PRM.param_shapes(cfg).items()}
    return {k: AF._factored(v, mf)
            and not (v.ndim == 2 and k in M.BLOCK_KEYS)
            for k, v in gshapes.items()}, gshapes


def init_pp_af_state(pp_params, mesh: Mesh, cfg: ViTConfig,
                     min_factor: int = 0):
    from ..ops import adafactor as AF
    fac, gshapes = pp_af_factored(cfg, min_factor)
    shapes = _af_zeros_with_fac(gshapes, fac)
    sp = _af_specs_with_fac(gshapes, pp_param_specs(cfg), fac)

    def place(tree, spt):
        return {k: jax.jit(lambda s=v.shape: jnp.zeros(s, jnp.float32),
                           out_shardings=NamedSharding(mesh, spt[k]))()
                for k, v in tree.items()}

    return AF.AdafactorState(place(shapes.vr, sp.vr), place(shapes.vc, sp.vc),
                             place(shapes.vf, sp.vf), {})


def make_pp_train_step_adafactor(cfg: ViTConfig, mesh: Mesh,
                                 microbatches: int, schedule: str = "gpipe",
                                 virtual_stages: int = 1,
                                 weight_decay_2d_only: bool = True,
                                 relative_step: bool = True,
                                 min_factor: int = 0):
    """(pp_params, af_state, inputs, labels, step, lr, wd)
        -> (pp_params, af_state, loss) on a (data, pipe) mesh."""
    from ..ops import adafactor as AF
    S = mesh.shape["pipe"]
    assert not cfg.is_moe, "MoE: dp/ep (make_ep_train_step_adafactor)"
    assert cfg.num_layers % (S * virtual_stages) == 0
    assert schedule in ("gpipe", "1f1b", "1f1b-interleaved"), schedule
    specs = pp_param_specs(cfg)
    mf = min_factor or AF.MIN_FACTOR
    # stacked ndim-2 block leaves (LN/bias stacks, (L, C)-shaped) must
    # NEVER rank-factor — their trailing "matrix" crosses the stacked-L
    # axis the pipe slice cuts, and factoring across a stack is not
    # meaningful structure anyway (ops/adafactor.py module doc).  At the
    # production MIN_FACTOR=128 this matches the plain step for every
    # realistic depth; the override makes it hold at ANY min_factor/L.
    fac, gshapes = pp_af_factored(cfg, mf)
    stspec = _af_specs_with_fac(gshapes, specs, fac)

    def spmd(p, st, inputs, labels, step, lr, wd):
        if schedule == "gpipe":
            loss, grads = jax.value_and_grad(_pp_loss)(
                p, inputs, labels, cfg, S, microbatches)
        elif schedule == "1f1b-interleaved":
            loss, grads = _pp_1f1b_interleaved(
                p, inputs, labels, cfg, S, virtual_stages, microbatches)
        else:
            loss, grads = _pp_1f1b(p, inputs, labels, cfg, S, microbatches)
        grads = {k: (jax.lax.psum(g, "pipe") if specs[k] == P() else g)
                 for k, g in grads.items()}
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, "data"), grads)
        mask = opt.decay_mask_2d(p) if weight_decay_2d_only else None
        # plain per-stage step: the pipe slice is a leading-axis shard, to
        # which the update is exactly invariant given the fac override
        # (ndim-2 stacks full-v; factored matrices' trailing dims are
        # unchanged by L-slicing)
        p, st = AF.step(p, grads, st, step, lr, weight_decay=wd,
                        decay_mask=mask, relative_step=relative_step,
                        factored=fac)
        return p, st, jax.lax.pmean(loss, "data")

    mapped = shard_map(
        spmd, mesh=mesh,
        in_specs=(dict(specs), stspec, P("data"), P("data"), P(), P(), P()),
        out_specs=(dict(specs), stspec, P()),
        check_rep=False)
    return jax.jit(mapped, donate_argnums=(0, 1))


def permute_af_tree(tree, cfg: ViTConfig, S: int, V: int,
                    inverse: bool = False):
    """Apply (or undo) the interleaved layer permutation to an Adafactor
    state tree: any BLOCK_KEYS leaf with a leading num_layers axis (vr/vc
    keep it; factored leaves' vf is a scalar placeholder) permutes like its
    parameter; everything else passes through."""
    order = np.asarray(interleave_layer_order(cfg.num_layers, S, V))
    idx = np.argsort(order) if inverse else order
    return {k: (np.asarray(v)[idx]
                if (k in M.BLOCK_KEYS and np.ndim(v) >= 1
                    and np.shape(v)[0] == cfg.num_layers) else v)
            for k, v in tree.items()}
