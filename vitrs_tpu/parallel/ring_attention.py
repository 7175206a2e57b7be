"""Ring attention — context parallelism over an ICI ring (beyond-reference).

The reference has no long-context story at all (SURVEY.md §5.7: it
materializes full O(T²) buffers and is capped by the wpe table).  For ViT
workloads the sequence is short, so context parallelism is optional — but the
framework provides it for the long-sequence GPT mode: the KV shards rotate
around the mesh ring via `jax.lax.ppermute` (point-to-point, neighbor-only —
rides ICI at full bisection bandwidth) while each device accumulates its
queries' attention over every block with the same online-softmax statistics
the flash kernel uses on-chip.  Communication overlaps compute once blocks
are large enough; after N-1 hops every query has seen every key.

Semantics: bidirectional or causal over the GLOBAL sequence (each shard knows
its global offset from its ring index).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _block_attend(q, k, v, m, l, acc, q_off, k_off, sm_scale, causal):
    """One online-softmax accumulation step against a rotated KV block.
    q: (B,H,Tq,D); k/v: (B,H,Tk,D); m/l: (B,H,Tq,1); acc: (B,H,Tq,D)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    if causal:
        Tq, Tk = q.shape[2], k.shape[2]
        rows = q_off + jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0)
        cols = k_off + jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1)
        s = jnp.where(cols <= rows, s, -jnp.inf)
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m, m_curr)
    # guard fully-masked rows (m_next == -inf)
    safe_m = jnp.where(jnp.isfinite(m_next), m_next, 0.0)
    alpha = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
    p = jnp.exp(jnp.where(jnp.isfinite(s), s - safe_m, -jnp.inf))
    l_next = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
    pv = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                    preferred_element_type=jnp.float32)
    acc_next = acc * alpha + pv
    return m_next, l_next, acc_next


def make_ring_attention(mesh: Mesh, axis: str = "data",
                        causal: bool = False):
    """Build a jitted ring attention: q/k/v (B, H, T, D) sharded on T over
    `axis`; returns out with the same sharding."""
    n = mesh.shape[axis]

    def local_fn(q, k, v):
        B, H, Tq, D = q.shape
        sm_scale = 1.0 / (D ** 0.5)
        idx = jax.lax.axis_index(axis)
        Tk = k.shape[2]
        m = jnp.full((B, H, Tq, 1), -jnp.inf, jnp.float32)
        l = jnp.zeros((B, H, Tq, 1), jnp.float32)
        acc = jnp.zeros((B, H, Tq, D), jnp.float32)
        q_off = idx * Tq

        def step(carry, hop):
            k_blk, v_blk, m, l, acc = carry
            src = (idx - hop) % n                # who this block came from
            m, l, acc = _block_attend(q, k_blk, v_blk, m, l, acc,
                                      q_off, src * Tk, sm_scale, causal)
            perm = [(i, (i + 1) % n) for i in range(n)]
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            return (k_blk, v_blk, m, l, acc), None

        (k, v, m, l, acc), _ = jax.lax.scan(
            step, (k, v, m, l, acc), jnp.arange(n))
        inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        return (acc * inv).astype(q.dtype)

    spec = P(None, None, axis, None)
    mapped = shard_map(local_fn, mesh=mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_rep=False)
    return jax.jit(mapped)
