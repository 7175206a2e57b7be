"""Muon under sharded-parameter parallelism (TP and FSDP).

Beyond-reference (the reference ships single-threaded SGD, SURVEY §2.9 G7;
Muon itself is ops/muon.py).  The DP Muon step (data_parallel.py) keeps
params replicated, so the Newton-Schulz chain is trivially local; here the
matrices are SHARDED at rest and the NS iteration needs whole (OC, IC)
matrices, so each family gets its own treatment:

TP (2-D data x model shard_map mesh, tensor_parallel.py layout):
  The Muon matrices are column/row-sharded on the model axis.  Momentum
  stays sharded (elementwise); the nesterov effective gradient is
  all-gathered per leaf back to the CANONICAL stacked shape, the NS chain
  runs on canonical matrices — sharded over the model axis on the LAYER
  dim when tp | L (each device orthogonalizes L/tp layers, one extra
  all-gather), replicated otherwise (NS is ~1e-3 of a train step's FLOPs
  at GPT-2 scale, see ops/muon.py) — and each device slices its own model
  shard of the orthogonalized update.  Because gather∘slice is exact and
  every op commutes with it, the math is IDENTICAL to ops/muon.step on one
  device (tests/test_muon_parallel.py pins this).

FSDP (1-D GSPMD mesh, fsdp.py layout):
  Params/momentum/m/v all live sharded at rest; the step body just calls
  ops/muon.step and lets GSPMD insert the gathers the NS matmul chain
  needs from the sharding annotations alone — the same
  annotate-and-let-XLA-partition contract as the AdamW FSDP step.

Pipeline: needs no code — layers are sharded on the L dim across stages
and the NS chain is per-layer independent, so ops/muon.step applied to a
stage's local (L/stages, OC, IC) leaves is already exact.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..config import ViTConfig
from ..models import model as M
from ..ops import muon as MU
from ..ops import optimizer as opt
from . import fsdp
from . import tensor_parallel as tp


# --- TP: Muon-leaf layout descriptors ---------------------------------------
#
# Per TP-layout Muon leaf: the model-sharded axis, and how the full
# (gathered) leaf maps to/from the canonical stacked matrix Muon sees on a
# single device (ops/muon.MUON_KEYS shapes).

def _tp_muon_layout(cfg: ViTConfig):
    """{tp_leaf: gather_axis} for this config's Muon-owned TP leaves."""
    lay = {"attprojw": 2, "fcw": 1, "fcprojw": 2}
    if cfg.is_gqa:
        lay.update(qw=1, kw=1, vw=1)
    else:
        lay["qkv3w"] = 2
    return lay


def _gather_full(x, axis_name, dim):
    return jax.lax.all_gather(x, axis_name, axis=dim, tiled=True)


def _slice_own(x, axis_name, dim, size):
    idx = jax.lax.axis_index(axis_name)
    return jax.lax.dynamic_slice_in_dim(x, idx * size, size, axis=dim)


def _ns_canonical(eff, axis_name, tp_size, ns_steps):
    """NS on a canonical (L, OC, IC) stack, work-sharded over the model
    axis on the layer dim when it divides (NS is per-layer independent);
    one all-gather brings every device the full orthogonalized stack."""
    L = eff.shape[0]
    if tp_size > 1 and L % tp_size == 0:
        own = _slice_own(eff, axis_name, 0, L // tp_size)
        o = MU.newton_schulz5(own, steps=ns_steps)
        return _gather_full(o, axis_name, 0)
    return MU.newton_schulz5(eff, steps=ns_steps)


def _tp_muon_update(p, grads, momentum_tree, cfg: ViTConfig, lr,
                    mom: float, weight_decay: float, ns_steps: int,
                    axis_name: str, tp_size: int):
    """The Muon half of the hybrid step on TP-layout leaves.  Mirrors
    ops/muon.step's matrix branch exactly (nesterov momentum, canonical
    aspect scale, decoupled decay); returns (new_muon_params, new_momentum).
    """
    layout = _tp_muon_layout(cfg)
    new_p, new_mom = {}, {}

    def canon_eff(leaves):
        """nesterov eff per leaf (sharded, f32) + updated momentum."""
        effs = {}
        for k, dim in leaves.items():
            gf = grads[k].astype(jnp.float32)
            buf = mom * momentum_tree[k] + gf
            new_mom[k] = buf
            effs[k] = gf + mom * buf
        return effs

    def apply(k, o_local, scale):
        pf = p[k].astype(jnp.float32)
        if weight_decay:
            pf = pf * (1.0 - lr * weight_decay)
        new_p[k] = (pf - lr * scale * o_local).astype(p[k].dtype)

    if cfg.is_gqa:
        # canonical qkvw = [q | k | v] concat on the OC dim; NS must run on
        # the packed matrix to match the single-device policy
        effs = canon_eff({k: layout[k] for k in ("qw", "kw", "vw")})
        parts = [_gather_full(effs[k], axis_name, 1) for k in ("qw", "kw",
                                                               "vw")]
        sizes = [parts[0].shape[1], parts[1].shape[1], parts[2].shape[1]]
        eff = jnp.concatenate(parts, axis=1)          # (L, C+2kvd, C)
        o = _ns_canonical(eff, axis_name, tp_size, ns_steps
                          ).astype(jnp.float32)
        scale = max(1.0, eff.shape[-2] / eff.shape[-1]) ** 0.5
        off = 0
        for k, sz in zip(("qw", "kw", "vw"), sizes):
            o_k = jax.lax.dynamic_slice_in_dim(o, off, sz, axis=1)
            off += sz
            apply(k, _slice_own(o_k, axis_name, 1, sz // tp_size), scale)
    elif "qkv3w" in p:
        effs = canon_eff({"qkv3w": 2})
        full = _gather_full(effs["qkv3w"], axis_name, 2)   # (L, 3, C, C)
        L, _, C, _ = full.shape
        eff = full.reshape(L, 3 * C, C)                    # canonical qkvw
        o = _ns_canonical(eff, axis_name, tp_size, ns_steps
                          ).astype(jnp.float32)
        scale = max(1.0, eff.shape[-2] / eff.shape[-1]) ** 0.5
        o = o.reshape(L, 3, C, C)
        apply("qkv3w", _slice_own(o, axis_name, 2, C // tp_size), scale)

    for k in ("attprojw", "fcw", "fcprojw"):
        dim = layout[k]
        effs = canon_eff({k: dim})
        eff = _gather_full(effs[k], axis_name, dim)        # canonical
        o = _ns_canonical(eff, axis_name, tp_size, ns_steps
                          ).astype(jnp.float32)
        scale = max(1.0, eff.shape[-2] / eff.shape[-1]) ** 0.5
        apply(k, _slice_own(o, axis_name, dim,
                            eff.shape[dim] // tp_size), scale)

    if "patchw" in p and "patchw" in MU.MUON_KEYS:          # vit: replicated
        effs = canon_eff({"patchw": None})
        eff = effs["patchw"]
        o = MU.newton_schulz5(eff, steps=ns_steps).astype(jnp.float32)
        apply("patchw", o, max(1.0, eff.shape[-2] / eff.shape[-1]) ** 0.5)

    return new_p, new_mom


def _split_qkv_w(w, cfg: ViTConfig):
    """Canonical qkvw-shaped tensor -> its TP-layout leaves."""
    C = cfg.channels
    if cfg.is_gqa:
        kvd = cfg.kv_dim
        return {"qw": w[:, :C], "kw": w[:, C:C + kvd], "vw": w[:, C + kvd:]}
    return {"qkv3w": w.reshape(cfg.num_layers, 3, C, C)}


def _split_qkv_b(b, cfg: ViTConfig):
    C = cfg.channels
    if cfg.is_gqa:
        kvd = cfg.kv_dim
        return {"qb": b[:, :C], "kb": b[:, C:C + kvd], "vb": b[:, C + kvd:]}
    return {"qkv3b": b.reshape(cfg.num_layers, 3, C)}


def muon_state_to_tp(state: MU.MuonState, cfg: ViTConfig):
    """Canonical MuonState -> (momentum, m, v) dicts in the TP leaf layout
    (resume a DP/single-device Muon checkpoint under TP)."""
    mom, m, v = dict(state.momentum), dict(state.m), dict(state.v)
    mom.update(_split_qkv_w(mom.pop("qkvw"), cfg))
    for t in (m, v):
        t.update(_split_qkv_b(t.pop("qkvb"), cfg))
    return mom, m, v


def muon_state_from_tp(mom: Dict, m: Dict, v: Dict,
                       cfg: ViTConfig) -> MU.MuonState:
    """Inverse of muon_state_to_tp (gathered TP trees -> canonical)."""
    L, C = cfg.num_layers, cfg.channels
    mom, m, v = dict(mom), dict(m), dict(v)
    if cfg.is_gqa:
        mom["qkvw"] = jnp.concatenate(
            [mom.pop("qw"), mom.pop("kw"), mom.pop("vw")], axis=1)
        for t in (m, v):
            t["qkvb"] = jnp.concatenate(
                [t.pop("qb"), t.pop("kb"), t.pop("vb")], axis=1)
    else:
        mom["qkvw"] = mom.pop("qkv3w").reshape(L, 3 * C, C)
        for t in (m, v):
            t["qkvb"] = t.pop("qkv3b").reshape(L, 3 * C)
    return MU.MuonState(momentum=mom, m=m, v=v)


def tp_muon_keys(cfg: ViTConfig):
    keys = list(_tp_muon_layout(cfg))
    if cfg.mode == "vit":
        keys.append("patchw")
    return tuple(keys)


def place_tp_muon_state(state: MU.MuonState, cfg: ViTConfig, mesh: Mesh):
    """Canonical MuonState -> TP layout, device_put with the TP shardings."""
    mom, m, v = muon_state_to_tp(state, cfg)
    specs = tp.tp_param_specs(cfg)

    def put(t):
        return {k: jax.device_put(x, NamedSharding(mesh, specs[k]))
                for k, x in t.items()}

    return put(mom), put(m), put(v)


def init_tp_muon_state(tp_params, cfg: ViTConfig, mesh: Mesh):
    """(momentum, m, v) dict trees in TP layout: momentum over the Muon
    leaves (sharded like their params), AdamW m/v over the rest."""
    specs = tp.tp_param_specs(cfg)
    mu_keys = set(tp_muon_keys(cfg))

    def zeros(keys):
        return {k: jax.jit(lambda s=tp_params[k].shape:
                           jnp.zeros(s, jnp.float32),
                           out_shardings=NamedSharding(mesh, specs[k]))()
                for k in keys}

    rest = [k for k in tp_params if k not in mu_keys]
    return zeros(mu_keys), zeros(rest), zeros(rest)


def make_tp_muon_train_step(cfg: ViTConfig, mesh: Mesh,
                            sequence_parallel: bool = False,
                            momentum: float = 0.95,
                            weight_decay: float = 0.0,
                            ns_steps: int = 5):
    """2-D SPMD hybrid Muon/AdamW train step on the TP parameter layout.

    Signature: (tp_params, mom, m, v, inputs, targets, step, lr, alr)
            -> (tp_params, mom, m, v, loss)
    mom is the Muon momentum tree (TP-sharded, from init_tp_muon_state);
    m/v are AdamW state over the remaining leaves.  Math matches the
    single-device hybrid step bit-for-bit up to reduction order (pinned in
    tests/test_muon_parallel.py).
    """
    specs = tp.tp_param_specs(cfg)
    tp_size = mesh.shape["model"]
    assert cfg.num_heads % tp_size == 0, (cfg.num_heads, tp_size)
    mu_keys = set(tp_muon_keys(cfg))
    mom_specs = {k: specs[k] for k in mu_keys}
    rest_specs = {k: s for k, s in specs.items() if k not in mu_keys}

    def spmd(p, mom_tree, m, v, inputs, targets, step, lr, alr):
        loss, grads = jax.value_and_grad(tp.tp_loss)(
            p, inputs, targets, cfg, "model", sequence_parallel, tp_size)
        if sequence_parallel:
            for k in tp.SP_PARTIAL_GRADS:
                grads[k] = jax.lax.psum(grads[k], "model")
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, "data"), grads)
        mu_p = {k: p[k] for k in mu_keys}
        new_mu, new_mom = _tp_muon_update(
            mu_p, grads, mom_tree, cfg, lr, momentum, weight_decay,
            ns_steps, "model", tp_size)
        rest_p = {k: v_ for k, v_ in p.items() if k not in mu_keys}
        rest_g = {k: grads[k] for k in rest_p}
        rest_new, m, v = opt.adamw_tree(
            rest_p, rest_g, m, v, step, alr, weight_decay=weight_decay,
            decay_mask=opt.decay_mask_2d(rest_p))
        new_mu.update(rest_new)
        return (new_mu, new_mom, m, v,
                jax.lax.pmean(jax.lax.pmean(loss, "data"), "model"))

    mapped = shard_map(
        spmd, mesh=mesh,
        in_specs=(dict(specs), mom_specs, rest_specs, rest_specs,
                  P("data"), P("data"), P(), P(), P()),
        out_specs=(dict(specs), mom_specs, rest_specs, rest_specs, P()),
        check_rep=False)
    return jax.jit(mapped, donate_argnums=(0, 1, 2, 3))


# --- FSDP ------------------------------------------------------------------

def init_fsdp_muon_state(params, mesh: Mesh):
    """MuonState with every leaf sharded like its parameter (ZeRO-style:
    momentum/m/v never exist unsharded anywhere)."""
    specs = fsdp.param_specs(params, mesh)
    mu, rest = MU.split_muon(params)

    def zeros(tree):
        return {k: jax.jit(lambda s=v.shape: jnp.zeros(s, jnp.float32),
                           out_shardings=NamedSharding(mesh, specs[k]))()
                for k, v in tree.items()}

    return MU.MuonState(momentum=zeros(mu), m=zeros(rest), v=zeros(rest))


def make_fsdp_muon_train_step(cfg: ViTConfig, mesh: Mesh, params,
                              momentum: float = 0.95,
                              weight_decay: float = 0.0):
    """GSPMD hybrid Muon/AdamW step on the FSDP layout.  The body is the
    plain single-device ops/muon.step; the sharding annotations alone make
    GSPMD insert the all-gathers the NS chain needs and keep the
    elementwise state updates shard-local.

    Signature: (params, state: MuonState, inputs, targets, step, lr, alr)
            -> (params, state, loss)
    """
    specs = fsdp.param_specs(params, mesh)
    psh = {k: NamedSharding(mesh, s) for k, s in specs.items()}
    mu, rest = MU.split_muon(params)
    state_sh = MU.MuonState(momentum={k: psh[k] for k in mu},
                            m={k: psh[k] for k in rest},
                            v={k: psh[k] for k in rest})
    batch_sh = NamedSharding(mesh, P(fsdp.AXIS))
    repl = NamedSharding(mesh, P())

    def step_fn(params, state, inputs, targets, step, lr, alr):
        loss, grads = jax.value_and_grad(M.loss_fn)(params, inputs,
                                                    targets, cfg)
        grads = {k: jax.lax.with_sharding_constraint(
                     g, NamedSharding(mesh, specs[k]))
                 for k, g in grads.items()}
        params, state = MU.step(params, grads, state, step + 1, lr,
                                momentum=momentum, adamw_lr=alr,
                                weight_decay=weight_decay)
        return params, state, loss

    return jax.jit(
        step_fn,
        in_shardings=(psh, state_sh, batch_sh, batch_sh, repl, repl, repl),
        out_shardings=(psh, state_sh, repl),
        donate_argnums=(0, 1),
    )
