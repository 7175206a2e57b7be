"""Shared shard_map-local gradient transforms for the mesh-plan families.

The reference has no distributed story at all (SURVEY.md §2 rows 26-27), and
through round 4 the production features that large meshes exist for —
global grad-norm clipping and micro-batch gradient accumulation — lived only
on the native DP path (parallel/data_parallel.py:146-186).  These helpers
bring the same semantics to every shard_map step factory:

- ``global_grad_norm``: the true global L2 norm of a grad tree whose leaves
  live in a shard_map body.  A leaf's sum-of-squares is psum'd over exactly
  the mesh axes its PartitionSpec names (each index along those axes holds a
  DISTINCT shard); replicated leaves (spec ``P()``) are counted once.  Equals
  the single-device ``sqrt(sum(g**2))`` up to reduction order.
- ``clip_by_global_norm``: DP-path clip semantics (data_parallel.py:176-180):
  scale all grads by ``min(1, clip/(norm+1e-6))``; the RETURNED norm is the
  pre-clip value — the quantity worth monitoring.
- ``accumulate_microbatches``: DP-path accumulation semantics
  (data_parallel.py:146-166): split the local batch into ``accum_steps``
  micro-batches, scan a (loss, grads) function over them with fp32 grad
  accumulators, return the mean loss and mean grads.  1/accum_steps the
  activation memory at the same effective batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _spec_axes(spec) -> tuple:
    """Mesh axes a PartitionSpec shards over (flattened, sorted)."""
    axes = []
    for part in tuple(spec):
        if part is None:
            continue
        if isinstance(part, (tuple, list)):
            axes.extend(part)
        else:
            axes.append(part)
    return tuple(sorted(axes))


def global_grad_norm(grads: dict, specs: dict) -> jax.Array:
    """Global L2 norm of a shard_map-local grad tree.

    ``specs[k]`` must be the PartitionSpec the grad ACTUALLY lives in at the
    call site (i.e. after any partial-grad psums), so sharded leaves psum
    their sum-of-squares over their shard axes and replicated leaves count
    once.  One psum per distinct axis set.
    """
    groups: dict = {}
    for k, g in grads.items():
        ax = _spec_axes(specs[k])
        sq = jnp.sum(jnp.square(g.astype(jnp.float32)))
        groups[ax] = groups.get(ax, jnp.zeros((), jnp.float32)) + sq
    total = jnp.zeros((), jnp.float32)
    for ax, sq in groups.items():
        total = total + (jax.lax.psum(sq, ax) if ax else sq)
    return jnp.sqrt(total)


def clip_by_global_norm(grads: dict, specs: dict, clip_norm: float):
    """(clipped_grads, pre_clip_norm) with the DP path's clip formula."""
    gnorm = global_grad_norm(grads, specs)
    scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-6))
    return {k: g * scale for k, g in grads.items()}, gnorm


def accumulate_microbatches(loss_and_grads, params: dict, inputs, targets,
                            accum_steps: int):
    """Mean (loss, grads) over ``accum_steps`` micro-batch slices of the
    local batch.  ``loss_and_grads(params, x, y) -> (loss, grad_tree)``;
    collectives inside it are legal (lax.scan over a shard_map body)."""
    if accum_steps == 1:
        return loss_and_grads(params, inputs, targets)
    micro = inputs.shape[0] // accum_steps
    assert micro * accum_steps == inputs.shape[0], (
        f"local batch {inputs.shape[0]} must divide accum_steps "
        f"{accum_steps}")
    xs = (inputs.reshape((accum_steps, micro) + inputs.shape[1:]),
          targets.reshape((accum_steps, micro) + targets.shape[1:]))

    def acc(carry, xy):
        loss_sum, g_sum = carry
        loss, g = loss_and_grads(params, *xy)
        return (loss_sum + loss,
                jax.tree_util.tree_map(
                    lambda a, b: a + b.astype(jnp.float32), g_sum, g)), None

    zero = jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params)
    (loss_sum, g_sum), _ = jax.lax.scan(acc, (jnp.zeros(()), zero), xs)
    inv = 1.0 / accum_steps
    return loss_sum * inv, jax.tree_util.tree_map(lambda g: g * inv, g_sum)
