"""Pipeline parallelism — GPipe-style microbatching over a "pipe" mesh axis.

Beyond the reference's capability set (SURVEY.md §2 row 26) — the third
parallelism axis after data (data_parallel.py) and tensor (tensor_parallel.py).

Design: the stacked (L, ...) block parameters are sliced over the pipe axis
(L/S layers per stage).  A `lax.scan` over M + S - 1 ticks runs the classic
schedule: stage 0 encodes microbatch t, every stage applies its layer slab,
activations hop to the next stage via `ppermute` (neighbor-only, rides ICI),
and the last stage computes the loss for the microbatch that has finished
draining.  Autodiff differentiates straight through the scan+ppermute — the
transpose of a permutation is the inverse permutation, so the backward pass
is automatically the reverse pipeline.

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
    """Block tensors sliced over the pipe axis; everything else replicated."""
    specs = {k: P() for k in PRM.tensor_order(cfg) if k not in M.BLOCK_KEYS}
    specs.update({k: P("pipe") for k in M.BLOCK_KEYS})
    return specs


def _pp_loss(p, images, labels, cfg: ViTConfig, n_stages: int,
             microbatches: int):
    """Pipelined forward + loss, running inside shard_map on the pipe axis."""
    S, Mb = n_stages, microbatches
    stage = jax.lax.axis_index("pipe")
    B = images.shape[0]
    Bm = B // Mb
    micro_x = images.reshape((Mb, Bm) + images.shape[1:])
    micro_y = labels.reshape(Mb, Bm)
    stage_cfg = cfg.replace(num_layers=cfg.num_layers // S)
    dtype = jnp.dtype(cfg.dtype)
    T = cfg.seq_len
    perm = [(i, (i + 1) % S) for i in range(S)]

    def head_loss(y, lbl):
        lnf = basic.layernorm_cv(y, p["lnfw"], p["lnfb"])
        pooled = lnf[:, 0, :] if cfg.pool == "cls" else jnp.mean(lnf, axis=1)
        logits = basic.linear(pooled, p["headw"], p["headb"]).astype(jnp.float32)
        return jnp.mean(basic.cross_entropy_from_logits(logits, lbl))

    def tick(carry, t):
        act, loss_sum = carry
        in_idx = jnp.clip(t, 0, Mb - 1)
        x0 = M.vit_encode(
            jax.lax.dynamic_index_in_dim(micro_x, in_idx, 0, keepdims=False),
            p, cfg).astype(dtype)
        x_in = jnp.where(stage == 0, x0, act)
        y = M.transformer(x_in, p, stage_cfg, causal=False)
        out_idx = t - (S - 1)
        lbl = jax.lax.dynamic_index_in_dim(
            micro_y, jnp.clip(out_idx, 0, Mb - 1), 0, keepdims=False)
        ml = head_loss(y, lbl)
        valid = jnp.logical_and(stage == S - 1,
                                jnp.logical_and(out_idx >= 0, out_idx < Mb))
        loss_sum = loss_sum + jnp.where(valid, ml, 0.0)
        act_next = jax.lax.ppermute(y, "pipe", perm)
        return (act_next, loss_sum), None

    act0 = jnp.zeros((Bm, T, cfg.channels), dtype)
    (_, loss_sum), _ = jax.lax.scan(tick, (act0, jnp.zeros((), jnp.float32)),
                                    jnp.arange(Mb + S - 1))
    # only the last stage accumulated loss; psum fwd / identity bwd
    return reduce_out(loss_sum, "pipe") / Mb


def make_pp_train_step(cfg: ViTConfig, mesh: Mesh, microbatches: int):
    """(pp_params, m, v, images, labels, step, lr, wd) -> (..., loss) on a
    (data, pipe) mesh; batch sharded over data, layers over pipe."""
    S = mesh.shape["pipe"]
    assert cfg.num_layers % S == 0, (cfg.num_layers, S)
    specs = pp_param_specs(cfg)

    def spmd(p, m, v, images, labels, step, lr, wd):
        loss, grads = jax.value_and_grad(_pp_loss)(p, images, labels, cfg, S,
                                                   microbatches)
        # replicated leaves: true grad = sum of per-stage partials
        grads = {k: (jax.lax.psum(g, "pipe") if specs[k] == P() else g)
                 for k, g in grads.items()}
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, "data"), grads)
        p, m, v = opt.adamw_tree(p, grads, m, v, step, lr, weight_decay=wd)
        return p, m, v, jax.lax.pmean(loss, "data")

    mapped = shard_map(
        spmd, mesh=mesh,
        in_specs=(dict(specs), dict(specs), dict(specs),
                  P("data"), P("data"), P(), P(), P()),
        out_specs=(dict(specs), dict(specs), dict(specs), P()),
        check_rep=False)
    return jax.jit(mapped, donate_argnums=(0, 1, 2))


def place_pp_params(params, cfg: ViTConfig, mesh: Mesh):
    specs = pp_param_specs(cfg)
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            for k, v in params.items()}


def init_pp_opt_state(pp_params, mesh: Mesh, cfg: ViTConfig):
    specs = pp_param_specs(cfg)

    def zeros():
        return {k: jax.jit(lambda s=v.shape: jnp.zeros(s, jnp.float32),
                           out_shardings=NamedSharding(mesh, specs[k]))()
                for k, v in pp_params.items()}

    return zeros(), zeros()
