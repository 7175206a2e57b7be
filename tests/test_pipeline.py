"""Pipeline parallelism: (data=2, pipe=4) mesh vs single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.models import model as M
from vitrs_tpu.parallel import pipeline as pp

CFG = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
    num_layers=4, channels=32, num_heads=2)   # 4 layers -> 4 pipe stages


def _data(B=8, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((B, 32, 32, 3), dtype=np.float32)),
            jnp.asarray(rng.integers(0, 10, (B,))))


def test_pp_loss_matches_single_device():
    mesh = pp.make_mesh_dp_pp(dp=2, pp=4)
    params = PRM.init_params(CFG, jax.random.PRNGKey(0))
    images, labels = _data()
    want = float(M.loss_fn(params, images, labels, CFG))
    ppp = pp.place_pp_params(params, CFG, mesh)
    m, v = pp.init_pp_opt_state(ppp, mesh, CFG)
    step = pp.make_pp_train_step(CFG, mesh, microbatches=2)
    dsh = NamedSharding(mesh, P("data"))
    _, _, _, loss = step(ppp, m, v, jax.device_put(images, dsh),
                         jax.device_put(labels, dsh),
                         jnp.asarray(1, jnp.int32),
                         jnp.asarray(0.0, jnp.float32),
                         jnp.asarray(0.0, jnp.float32))
    np.testing.assert_allclose(float(loss), want, rtol=2e-5)


def test_pp_gradients_match_single_device():
    mesh = pp.make_mesh_dp_pp(dp=2, pp=4)
    params = PRM.init_params(CFG, jax.random.PRNGKey(1))
    images, labels = _data(seed=1)
    _, grads_ref = jax.value_and_grad(M.loss_fn)(params, images, labels, CFG)

    specs = pp.pp_param_specs(CFG)

    def spmd(p, x, y):
        loss, g = jax.value_and_grad(pp._pp_loss)(p, x, y, CFG, 4, 2)
        g = {k: (jax.lax.psum(t, "pipe") if specs[k] == P() else t)
             for k, t in g.items()}
        g = jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, "data"), g)
        return jax.lax.pmean(loss, "data"), g

    fn = jax.jit(shard_map(spmd, mesh=mesh,
                           in_specs=(dict(specs), P("data"), P("data")),
                           out_specs=(P(), dict(specs)), check_rep=False))
    ppp = pp.place_pp_params(params, CFG, mesh)
    dsh = NamedSharding(mesh, P("data"))
    loss, got = fn(ppp, jax.device_put(images, dsh),
                   jax.device_put(labels, dsh))
    got = jax.device_get(got)
    for k in grads_ref:
        g_ref = np.asarray(grads_ref[k])
        scale = max(np.abs(g_ref).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(got[k]), g_ref, rtol=5e-4,
                                   atol=3e-5 * scale, err_msg=k)


def test_pp_layers_are_sharded():
    mesh = pp.make_mesh_dp_pp(dp=2, pp=4)
    params = PRM.init_params(CFG, jax.random.PRNGKey(0))
    ppp = pp.place_pp_params(params, CFG, mesh)
    shapes = {s.data.shape for s in ppp["fcw"].addressable_shards}
    assert shapes == {(1, 4 * CFG.channels, CFG.channels)}   # 1 layer/stage


def test_pp_training_decreases_loss():
    mesh = pp.make_mesh_dp_pp(dp=2, pp=4)
    params = PRM.init_params(CFG, jax.random.PRNGKey(2))
    images, labels = _data(seed=2)
    ppp = pp.place_pp_params(params, CFG, mesh)
    m, v = pp.init_pp_opt_state(ppp, mesh, CFG)
    step = pp.make_pp_train_step(CFG, mesh, microbatches=2)
    dsh = NamedSharding(mesh, P("data"))
    images = jax.device_put(images, dsh)
    labels = jax.device_put(labels, dsh)
    losses = []
    for i in range(1, 7):
        ppp, m, v, loss = step(ppp, m, v, images, labels,
                               jnp.asarray(i, jnp.int32),
                               jnp.asarray(3e-3, jnp.float32),
                               jnp.asarray(0.0, jnp.float32))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
