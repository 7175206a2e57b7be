"""Ring attention (context parallelism) vs single-device full attention, on
the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu.parallel import data_parallel as dp
from vitrs_tpu.parallel.ring_attention import make_ring_attention


def _qkv(B, H, T, D, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal((B, H, T, D),
                                                 dtype=np.float32))
                 for _ in range(3))


def _reference(q, k, v, causal):
    D = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(D)
    if causal:
        T = q.shape[2]
        s = jnp.where(jnp.tril(jnp.ones((T, T), bool)), s, -jnp.inf)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


@pytest.mark.parametrize("causal", [False, True])
def test_ring_matches_full(causal):
    mesh = dp.make_mesh()
    B, H, T, D = 2, 2, 64, 16          # T sharded 8 ways -> 8 per device
    q, k, v = _qkv(B, H, T, D, seed=1)
    ring = make_ring_attention(mesh, causal=causal)
    got = ring(q, k, v)                 # shard_map handles placement
    want = _reference(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_is_sharded_over_sequence():
    mesh = dp.make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P
    B, H, T, D = 1, 2, 64, 16
    q, k, v = _qkv(B, H, T, D, seed=2)
    sharding = NamedSharding(mesh, P(None, None, "data", None))
    q, k, v = (jax.device_put(x, sharding) for x in (q, k, v))
    ring = make_ring_attention(mesh, causal=False)
    out = ring(q, k, v)
    # output keeps the sequence sharding
    shard_ts = {s.data.shape[2] for s in out.addressable_shards}
    assert shard_ts == {T // 8}
