"""3-D parallelism (data=2 x model=2 x pipe=2) vs single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.models import model as M
from vitrs_tpu.parallel import threed as D3
from vitrs_tpu.parallel import tensor_parallel as tp

CFG = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
    num_layers=4, channels=32, num_heads=2)   # 2 layers/stage, 1 head/shard


def _data(B=8, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((B, 32, 32, 3), dtype=np.float32)),
            jnp.asarray(rng.integers(0, 10, (B,))))


def test_3d_loss_and_grads_match_single_device():
    mesh = D3.make_mesh_3d(dp=2, tp=2, pp=2)
    params = PRM.init_params(CFG, jax.random.PRNGKey(0))
    images, labels = _data()
    loss_ref, grads_ref = jax.value_and_grad(M.loss_fn)(params, images,
                                                        labels, CFG)
    specs = D3.param_specs_3d(CFG)
    replicated = [k for k, s in specs.items() if s == P()]

    def spmd(p, x, y):
        loss, g = jax.value_and_grad(D3._loss_3d)(p, x, y, CFG, 2, 2)
        for k in replicated:
            g[k] = jax.lax.psum(g[k], "pipe")
        g = jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, "data"), g)
        return jax.lax.pmean(loss, "data"), g

    fn = jax.jit(shard_map(spmd, mesh=mesh,
                           in_specs=(dict(specs), P("data"), P("data")),
                           out_specs=(P(), dict(specs)), check_rep=False))
    p3 = D3.place_params_3d(params, CFG, mesh)
    dsh = NamedSharding(mesh, P("data"))
    loss, g3 = fn(p3, jax.device_put(images, dsh), jax.device_put(labels, dsh))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-5)
    got = tp.from_tp_params(jax.device_get(g3), CFG)
    for k in grads_ref:
        g_ref = np.asarray(grads_ref[k])
        scale = max(np.abs(g_ref).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(got[k]), g_ref, rtol=5e-4,
                                   atol=3e-5 * scale, err_msg=k)


def test_3d_sharding_layout():
    mesh = D3.make_mesh_3d(dp=2, tp=2, pp=2)
    params = PRM.init_params(CFG, jax.random.PRNGKey(0))
    p3 = D3.place_params_3d(params, CFG, mesh)
    C = CFG.channels
    # fcw (L=4, 4C, C): pipe halves L, model halves 4C
    shapes = {s.data.shape for s in p3["fcw"].addressable_shards}
    assert shapes == {(2, 2 * C, C)}
    # ln1w (L, C): pipe halves L only
    shapes = {s.data.shape for s in p3["ln1w"].addressable_shards}
    assert shapes == {(2, C)}


def test_3d_training_decreases_loss():
    mesh = D3.make_mesh_3d(dp=2, tp=2, pp=2)
    params = PRM.init_params(CFG, jax.random.PRNGKey(1))
    images, labels = _data(seed=1)
    p3 = D3.place_params_3d(params, CFG, mesh)
    m, v = D3.init_opt_state_3d(p3, mesh, CFG)
    step = D3.make_3d_train_step(CFG, mesh, microbatches=2)
    dsh = NamedSharding(mesh, P("data"))
    images = jax.device_put(images, dsh)
    labels = jax.device_put(labels, dsh)
    losses = []
    for i in range(1, 6):
        p3, m, v, loss = step(p3, m, v, images, labels,
                              jnp.asarray(i, jnp.int32),
                              jnp.asarray(3e-3, jnp.float32),
                              jnp.asarray(0.0, jnp.float32))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_3d_sp_loss_and_grads_match_single_device():
    """4-D composition dp x tp(sp) x pp: the SP block form inside the
    pipeline must reproduce single-device loss/grads (mean pool: SP needs
    seq_len % tp == 0, and the CLS token makes T odd)."""
    cfg = CFG.replace(pool="mean")
    mesh = D3.make_mesh_3d(dp=2, tp=2, pp=2)
    params = PRM.init_params(cfg, jax.random.PRNGKey(2))
    images, labels = _data(seed=2)
    loss_ref, grads_ref = jax.value_and_grad(M.loss_fn)(params, images,
                                                        labels, cfg)
    specs = D3.param_specs_3d(cfg)
    replicated = [k for k, s in specs.items() if s == P()]

    def spmd(p, x, y):
        loss, g = jax.value_and_grad(D3._loss_3d)(p, x, y, cfg, 2, 2,
                                                  True, 2)
        for k in replicated:
            g[k] = jax.lax.psum(g[k], "pipe")
        for k in D3.SP_PARTIAL_GRADS:
            g[k] = jax.lax.psum(g[k], "model")
        g = jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, "data"), g)
        return jax.lax.pmean(loss, "data"), g

    fn = jax.jit(shard_map(spmd, mesh=mesh,
                           in_specs=(dict(specs), P("data"), P("data")),
                           out_specs=(P(), dict(specs)), check_rep=False))
    p3 = D3.place_params_3d(params, cfg, mesh)
    dsh = NamedSharding(mesh, P("data"))
    loss, g3 = fn(p3, jax.device_put(images, dsh), jax.device_put(labels, dsh))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-5)
    got = tp.from_tp_params(jax.device_get(g3), cfg)
    for k in grads_ref:
        g_ref = np.asarray(grads_ref[k])
        scale = max(np.abs(g_ref).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(got[k]), g_ref, rtol=5e-4,
                                   atol=3e-5 * scale, err_msg=k)


def test_3d_sp_train_step_runs_and_decreases():
    cfg = CFG.replace(pool="mean")
    mesh = D3.make_mesh_3d(dp=2, tp=2, pp=2)
    params = PRM.init_params(cfg, jax.random.PRNGKey(3))
    images, labels = _data(seed=3)
    p3 = D3.place_params_3d(params, cfg, mesh)
    m, v = D3.init_opt_state_3d(p3, mesh, cfg)
    step = D3.make_3d_train_step(cfg, mesh, microbatches=2,
                                 sequence_parallel=True)
    dsh = NamedSharding(mesh, P("data"))
    images = jax.device_put(images, dsh)
    labels = jax.device_put(labels, dsh)
    losses = []
    for i in range(1, 6):
        p3, m, v, loss = step(p3, m, v, images, labels,
                              jnp.asarray(i, jnp.int32),
                              jnp.asarray(3e-3, jnp.float32),
                              jnp.asarray(0.0, jnp.float32))
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_3d_gpt_loss_and_grads_match_single_device():
    """gpt mode through the 3-D mesh: weight-tied vocab head, per-token CE
    (the reference's own model, rusty_vit.rs:336-347). wte grads combine
    encode (stage 0) and head (last stage) contributions via the pipe psum."""
    cfg = get_config("gpt-nano", use_flash=False).replace(
        num_layers=4, channels=32, num_heads=2)
    rng = np.random.default_rng(5)
    B, T = 8, 16
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    y = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    params = PRM.init_params(cfg, jax.random.PRNGKey(5))
    loss_ref, grads_ref = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)

    mesh = D3.make_mesh_3d(dp=2, tp=2, pp=2)
    specs = D3.param_specs_3d(cfg)
    replicated = [k for k, s in specs.items() if s == P()]

    def spmd(p, xx, yy):
        loss, g = jax.value_and_grad(D3._loss_3d)(p, xx, yy, cfg, 2, 2)
        for k in replicated:
            g[k] = jax.lax.psum(g[k], "pipe")
        g = jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, "data"), g)
        return jax.lax.pmean(loss, "data"), g

    fn = jax.jit(shard_map(spmd, mesh=mesh,
                           in_specs=(dict(specs), P("data"), P("data")),
                           out_specs=(P(), dict(specs)), check_rep=False))
    p3 = D3.place_params_3d(params, cfg, mesh)
    dsh = NamedSharding(mesh, P("data"))
    loss, g3 = fn(p3, jax.device_put(x, dsh), jax.device_put(y, dsh))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-5)
    got = tp.from_tp_params(jax.device_get(g3), cfg)
    for k in grads_ref:
        g_ref = np.asarray(grads_ref[k])
        scale = max(np.abs(g_ref).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(got[k]), g_ref, rtol=5e-4,
                                   atol=3e-5 * scale, err_msg=k)


def test_3d_gpt_sp_matches_single_device():
    """gpt + SP inside the 3-D mesh (causal attention over gathered seq)."""
    cfg = get_config("gpt-nano", use_flash=False).replace(
        num_layers=4, channels=32, num_heads=2)
    rng = np.random.default_rng(6)
    B, T = 8, 16                      # T % tp == 0
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    y = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    params = PRM.init_params(cfg, jax.random.PRNGKey(6))
    loss_ref, _ = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)

    mesh = D3.make_mesh_3d(dp=2, tp=2, pp=2)
    specs = D3.param_specs_3d(cfg)
    replicated = [k for k, s in specs.items() if s == P()]

    def spmd(p, xx, yy):
        loss, g = jax.value_and_grad(D3._loss_3d)(p, xx, yy, cfg, 2, 2,
                                                  True, 2)
        for k in replicated:
            g[k] = jax.lax.psum(g[k], "pipe")
        for k in D3.SP_PARTIAL_GRADS:
            g[k] = jax.lax.psum(g[k], "model")
        g = jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, "data"), g)
        return jax.lax.pmean(loss, "data"), g

    fn = jax.jit(shard_map(spmd, mesh=mesh,
                           in_specs=(dict(specs), P("data"), P("data")),
                           out_specs=(P(), dict(specs)), check_rep=False))
    p3 = D3.place_params_3d(params, cfg, mesh)
    dsh = NamedSharding(mesh, P("data"))
    loss, _ = fn(p3, jax.device_put(x, dsh), jax.device_put(y, dsh))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-5)


def test_3d_gqa_gpt_grads_match_single_device():
    """GQA through the full 3-D mesh: the separate qw/kw/vw leaves shard on
    their own head dims (kv_heads=2 over tp=2) and the pipe axis slices L."""
    cfg = get_config("gpt-nano", use_flash=False).replace(
        num_layers=4, channels=32, num_heads=4, num_kv_heads=2)
    rng = np.random.default_rng(7)
    B, T = 8, 16
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    y = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    params = PRM.init_params(cfg, jax.random.PRNGKey(7))
    loss_ref, grads_ref = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)

    mesh = D3.make_mesh_3d(dp=2, tp=2, pp=2)
    specs = D3.param_specs_3d(cfg)
    assert "qw" in specs and "qkv3w" not in specs
    replicated = [k for k, s in specs.items() if s == P()]

    def spmd(p, xx, yy):
        loss, g = jax.value_and_grad(D3._loss_3d)(p, xx, yy, cfg, 2, 2)
        for k in replicated:
            g[k] = jax.lax.psum(g[k], "pipe")
        g = jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, "data"), g)
        return jax.lax.pmean(loss, "data"), g

    fn = jax.jit(shard_map(spmd, mesh=mesh,
                           in_specs=(dict(specs), P("data"), P("data")),
                           out_specs=(P(), dict(specs)), check_rep=False))
    p3 = D3.place_params_3d(params, cfg, mesh)
    dsh = NamedSharding(mesh, P("data"))
    loss, g3 = fn(p3, jax.device_put(x, dsh), jax.device_put(y, dsh))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-5)
    got = tp.from_tp_params(jax.device_get(g3), cfg)
    for k in grads_ref:
        g_ref = np.asarray(grads_ref[k])
        scale = max(np.abs(g_ref).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(got[k]), g_ref, rtol=5e-4,
                                   atol=3e-5 * scale, err_msg=k)


def test_3d_gpt_vocab_parallel_matches_single_device():
    """Vocab-parallel embedding + head/CE through the 3-D mesh: wte shards
    over the padded vocab rows on "model" (replicated on pipe); the last
    stage's full (Bm, T, V) logits tensor never materializes.  Gradients
    must equal the single-device model: wte per-model-shard-local (the vp
    contract) and pipe-psum'd (stage-0 embed + last-stage head live on
    different pipe rows)."""
    cfg = get_config("gpt-nano", use_flash=False).replace(
        num_layers=4, channels=32, num_heads=2)
    rng = np.random.default_rng(5)
    B, T = 8, 16
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    y = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    params = PRM.init_params(cfg, jax.random.PRNGKey(5))
    loss_ref, grads_ref = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)

    mesh = D3.make_mesh_3d(dp=2, tp=2, pp=2)
    specs = D3.param_specs_3d(cfg, vocab_parallel=True)
    assert tuple(specs["wte"]) == ("model", None)
    pipe_partial = [k for k, s in specs.items()
                    if not any(e == "pipe" for e in tuple(s))]

    def spmd(p, xx, yy):
        loss, g = jax.value_and_grad(D3._loss_3d)(
            p, xx, yy, cfg, 2, 2, False, 2, True)
        for k in pipe_partial:
            g[k] = jax.lax.psum(g[k], "pipe")
        g = jax.tree_util.tree_map(lambda t: jax.lax.pmean(t, "data"), g)
        return jax.lax.pmean(loss, "data"), g

    fn = jax.jit(shard_map(spmd, mesh=mesh,
                           in_specs=(dict(specs), P("data"), P("data")),
                           out_specs=(P(), dict(specs)), check_rep=False))
    p3 = D3.place_params_3d(params, cfg, mesh, vocab_parallel=True)
    dsh = NamedSharding(mesh, P("data"))
    loss, g3 = fn(p3, jax.device_put(x, dsh), jax.device_put(y, dsh))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-5)
    got = tp.from_tp_params(jax.device_get(g3), cfg, vocab_parallel=True)
    for k in grads_ref:
        g_ref = np.asarray(grads_ref[k])
        scale = max(np.abs(g_ref).max(), 1e-6)
        np.testing.assert_allclose(np.asarray(got[k]), g_ref, rtol=5e-4,
                                   atol=3e-5 * scale, err_msg=k)


def test_3d_gpt_vp_sp_composes():
    """vp + SP together through the 3-D mesh: loss finite and equal to the
    non-vp SP loss (the head math is the same — only its layout changes)."""
    cfg = get_config("gpt-nano", use_flash=False).replace(
        num_layers=4, channels=32, num_heads=2)
    rng = np.random.default_rng(7)
    B, T = 8, 16
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    y = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T)))
    params = PRM.init_params(cfg, jax.random.PRNGKey(7))
    mesh = D3.make_mesh_3d(dp=2, tp=2, pp=2)
    dsh = NamedSharding(mesh, P("data"))

    losses = {}
    for vp_flag in (False, True):
        specs = D3.param_specs_3d(cfg, vp_flag)

        def spmd(p, xx, yy, vp_flag=vp_flag):
            loss = D3._loss_3d(p, xx, yy, cfg, 2, 2, True, 2, vp_flag)
            return jax.lax.pmean(loss, "data")

        fn = jax.jit(shard_map(spmd, mesh=mesh,
                               in_specs=(dict(specs), P("data"), P("data")),
                               out_specs=P(), check_rep=False))
        p3 = D3.place_params_3d(params, cfg, mesh, vp_flag)
        losses[vp_flag] = float(fn(p3, jax.device_put(x, dsh),
                                   jax.device_put(y, dsh)))
    np.testing.assert_allclose(losses[True], losses[False], rtol=2e-5)
