"""Muon under TP and FSDP (parallel/muon_parallel.py) vs the single-device
hybrid Muon/AdamW step, on the 8-virtual-device CPU mesh.

Parity is checked STEP-WISE (both sides re-synced to the oracle's
params/state before every step): the Newton-Schulz chain runs in bf16 and
amplifies rounding-level gradient differences chaotically through the
param feedback loop, so free-running multi-step trajectories are not
comparable — but each step's gather/NS/scale/slice plumbing and the
momentum/m/v handoff are exactly pinned.  A separate chained run asserts
the free-running optimizer actually trains.  Covers the L-sharded NS path
(tp | L), the replicated-NS fallback, GQA's split qw/kw/vw leaves,
vit-mode patchw, sequence parallelism + decay, and the GSPMD FSDP form."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.models import model as M
from vitrs_tpu.ops import muon
from vitrs_tpu.parallel import fsdp
from vitrs_tpu.parallel import muon_parallel as mp
from vitrs_tpu.parallel import tensor_parallel as tp

CFG = get_config("gpt-nano", use_flash=False)
LR, ALR, STEPS = 0.02, 3e-3, 3


def _gpt_batches(cfg, n=STEPS, B=8, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        x = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, cfg.max_seq_len)))
        out.append((x, jnp.asarray(np.roll(np.asarray(x), -1, axis=1))))
    return out


def _assert_tree_close(got, want, rtol, atol, keys=None):
    for k in (keys or want):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=rtol, atol=atol, err_msg=k)


def _stepwise_tp_parity(cfg, dp, tpn, batches, weight_decay=0.0, sp=False,
                        seed=0):
    """Per-step parity: TP step output (params + momentum, recovered to the
    canonical layout) vs one oracle muon.step from the same state."""
    mesh = tp.make_mesh_2d(dp=dp, tp=tpn)
    step_fn = mp.make_tp_muon_train_step(cfg, mesh, sequence_parallel=sp,
                                         weight_decay=weight_decay)
    data_sh = NamedSharding(mesh, P("data"))
    params = PRM.init_params(cfg, jax.random.PRNGKey(seed))
    state = muon.init_state(params)
    for i, (x, y) in enumerate(batches):
        _, g = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)
        want_p, want_s = muon.step(params, g, state,
                                   jnp.asarray(i + 1, jnp.int32), LR,
                                   adamw_lr=ALR, weight_decay=weight_decay)
        tpp = tp.place_tp_params(params, cfg, mesh)
        mom, m, v = mp.place_tp_muon_state(state, cfg, mesh)
        tpp, mom, m, v, loss = step_fn(tpp, mom, m, v,
                                       jax.device_put(x, data_sh),
                                       jax.device_put(y, data_sh),
                                       jnp.asarray(i + 1, jnp.int32),
                                       jnp.asarray(LR, jnp.float32),
                                       jnp.asarray(ALR, jnp.float32))
        got_p = tp.from_tp_params(jax.device_get(tpp), cfg)
        got_s = mp.muon_state_from_tp(jax.device_get(mom), jax.device_get(m),
                                      jax.device_get(v), cfg)
        # params: the TP grads differ from the oracle's at reduction-order
        # level (~1e-9) and bf16 NS rounding flips amplify that chaotically
        # inside the quintic chain -> per-step atol 2e-3.  Plumbing bugs are
        # O(lr*scale)=2e-2+; the tight pin on identical inputs is
        # test_tp_muon_update_isolated_exact.
        _assert_tree_close(got_p, want_p, rtol=5e-3, atol=2e-3)
        # momentum is pure f32 elementwise — tight
        _assert_tree_close(got_s.momentum, want_s.momentum,
                           rtol=1e-5, atol=1e-7)
        _assert_tree_close(got_s.m, want_s.m, rtol=1e-5, atol=1e-7)
        assert np.isfinite(float(loss))
        params, state = want_p, want_s          # re-sync to the oracle


def test_tp_muon_matches_single_device():
    """dp=4 x tp=2, L=2 divisible by tp -> L-sharded NS path."""
    _stepwise_tp_parity(CFG, dp=4, tpn=2, batches=_gpt_batches(CFG))


def test_tp_muon_weight_decay_and_sp():
    """Sequence-parallel variant + decoupled decay on the Muon matrices."""
    _stepwise_tp_parity(CFG, dp=4, tpn=2, batches=_gpt_batches(CFG, seed=3),
                        weight_decay=0.1, sp=True, seed=3)


def test_tp_muon_replicated_ns_fallback():
    """tp=4 with L=2 (not divisible): NS runs replicated, same math."""
    cfg = CFG.replace(num_heads=4, channels=32)
    _stepwise_tp_parity(cfg, dp=2, tpn=4, batches=_gpt_batches(cfg, seed=1),
                        seed=1)


def test_tp_muon_gqa():
    """GQA leaves (qw/kw/vw) re-packed to the canonical qkvw before NS."""
    cfg = CFG.replace(num_heads=4, channels=32, num_kv_heads=2)
    _stepwise_tp_parity(cfg, dp=4, tpn=2, batches=_gpt_batches(cfg, seed=2),
                        seed=2)


def test_tp_muon_vit_patchw_and_chained_training():
    """vit mode: patchw rides the Muon branch; free-running chained steps
    (state threaded through the TP step itself) decrease the loss."""
    cfg = get_config("vit-tiny-4-cifar10", use_flash=False).replace(
        num_layers=2, channels=32, num_heads=2)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3), dtype=np.float32))
    y = jnp.asarray(rng.integers(0, 10, (8,)))
    _stepwise_tp_parity(cfg, dp=4, tpn=2, batches=[(x, y)], seed=5)

    mesh = tp.make_mesh_2d(dp=4, tp=2)
    params = PRM.init_params(cfg, jax.random.PRNGKey(5))
    tpp = tp.place_tp_params(params, cfg, mesh)
    mom, m, v = mp.init_tp_muon_state(tpp, cfg, mesh)
    step_fn = mp.make_tp_muon_train_step(cfg, mesh)
    data_sh = NamedSharding(mesh, P("data"))
    losses = []
    for i in range(8):
        tpp, mom, m, v, loss = step_fn(tpp, mom, m, v,
                                       jax.device_put(x, data_sh),
                                       jax.device_put(y, data_sh),
                                       jnp.asarray(i + 1, jnp.int32),
                                       jnp.asarray(LR, jnp.float32),
                                       jnp.asarray(ALR, jnp.float32))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, losses


def test_tp_muon_update_isolated_exact():
    """The Muon matrix update in isolation, fed bit-identical grads and
    momentum on both sides: gather/NS/scale/slice must reproduce the
    single-device branch to float-rounding level (no gradient-path chaos).
    Runs MHA and GQA layouts."""
    from jax.experimental.shard_map import shard_map
    for cfg in (CFG, CFG.replace(num_heads=4, channels=32, num_kv_heads=2)):
        params = PRM.init_params(cfg, jax.random.PRNGKey(9))
        key = jax.random.PRNGKey(10)
        grads = {k: 0.01 * jax.random.normal(jax.random.fold_in(key, i),
                                             v.shape, jnp.float32)
                 for i, (k, v) in enumerate(sorted(params.items()))}
        state = muon.init_state(params)
        mom0 = {k: 0.05 * jax.random.normal(jax.random.fold_in(key, 99 + i),
                                            v.shape, jnp.float32)
                for i, (k, v) in enumerate(sorted(state.momentum.items()))}
        state = muon.MuonState(momentum=mom0, m=state.m, v=state.v)
        want_p, want_s = muon.step(params, grads, state,
                                   jnp.asarray(1, jnp.int32), LR,
                                   adamw_lr=ALR)

        tpn = 2
        mesh = tp.make_mesh_2d(dp=4, tp=tpn)
        specs = tp.tp_param_specs(cfg)
        mu_keys = set(mp.tp_muon_keys(cfg))
        mu_specs = {k: specs[k] for k in mu_keys}

        def upd(p, g, mom, cfg=cfg, tpn=tpn):
            return mp._tp_muon_update(p, g, mom, cfg, LR, 0.95, 0.0, 5,
                                      "model", tpn)

        fn = jax.jit(shard_map(
            upd, mesh=mesh, in_specs=(mu_specs, mu_specs, mu_specs),
            out_specs=(mu_specs, mu_specs), check_rep=False))
        tpp = tp.place_tp_params(params, cfg, mesh)
        tpg = tp.place_tp_params(grads, cfg, mesh)
        mom_tp, _, _ = mp.place_tp_muon_state(state, cfg, mesh)
        new_p, new_mom = fn({k: tpp[k] for k in mu_keys},
                            {k: tpg[k] for k in mu_keys}, mom_tp)
        pad = dict(tpp)
        pad.update(jax.device_get(new_p))
        got_p = tp.from_tp_params(pad, cfg)
        momf = dict(mom_tp)
        momf.update(jax.device_get(new_mom))
        got_s = mp.muon_state_from_tp(momf, *mp.muon_state_to_tp(state, cfg)[1:],
                                      cfg)
        _assert_tree_close({k: got_p[k] for k in muon.split_muon(params)[0]},
                           {k: want_p[k] for k in muon.split_muon(params)[0]},
                           rtol=1e-5, atol=1e-6)
        _assert_tree_close(got_s.momentum, want_s.momentum,
                           rtol=1e-6, atol=1e-8)


def test_muon_state_tp_round_trip():
    for cfg in (CFG, CFG.replace(num_heads=4, channels=32, num_kv_heads=2)):
        params = PRM.init_params(cfg, jax.random.PRNGKey(7))
        state = muon.init_state(params)
        state = jax.tree_util.tree_map(
            lambda t: t + jax.random.normal(jax.random.PRNGKey(1), t.shape),
            state)
        back = mp.muon_state_from_tp(*mp.muon_state_to_tp(state, cfg), cfg)
        for a, b in zip(jax.tree_util.tree_leaves(state),
                        jax.tree_util.tree_leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fsdp_muon_matches_single_device():
    """8-way FSDP: params + MuonState sharded at rest, GSPMD collectives;
    step-wise parity then a chained finite-loss run."""
    batches = _gpt_batches(CFG, seed=4)
    mesh = fsdp.make_mesh(8)
    params = PRM.init_params(CFG, jax.random.PRNGKey(4))
    step_fn = mp.make_fsdp_muon_train_step(CFG, mesh, params)
    batch_sh = NamedSharding(mesh, P(fsdp.AXIS))
    state = muon.init_state(params)
    specs = fsdp.param_specs(params, mesh)

    def place_state(s):
        return muon.MuonState(
            momentum={k: jax.device_put(t, NamedSharding(mesh, specs[k]))
                      for k, t in s.momentum.items()},
            m={k: jax.device_put(t, NamedSharding(mesh, specs[k]))
               for k, t in s.m.items()},
            v={k: jax.device_put(t, NamedSharding(mesh, specs[k]))
               for k, t in s.v.items()})

    for i, (x, y) in enumerate(batches):
        _, g = jax.value_and_grad(M.loss_fn)(params, x, y, CFG)
        want_p, want_s = muon.step(params, g, state,
                                   jnp.asarray(i + 1, jnp.int32), LR,
                                   adamw_lr=ALR)
        fp = fsdp.place_params(params, mesh)
        fs = place_state(state)
        fp, fs, loss = step_fn(fp, fs, jax.device_put(x, batch_sh),
                               jax.device_put(y, batch_sh),
                               jnp.asarray(i, jnp.int32),
                               jnp.asarray(LR, jnp.float32),
                               jnp.asarray(ALR, jnp.float32))
        got_p = jax.device_get(fp)
        got_s = jax.device_get(fs)
        _assert_tree_close(got_p, want_p, rtol=2e-3, atol=5e-4)
        _assert_tree_close(got_s.momentum, want_s.momentum,
                           rtol=1e-5, atol=1e-7)
        assert np.isfinite(float(loss))
        params, state = want_p, want_s
