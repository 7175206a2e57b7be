"""Mixture-of-Experts: routing/dispatch correctness, model integration,
checkpoint round-trip, and expert-parallel gradient parity.

The reference's MLP is dense (rusty_vit.rs:112-117); MoE (ops/moe.py,
parallel/expert_parallel.py) is the beyond-reference sparse-scaling axis.
Test strategy follows SURVEY.md §4: exact-value oracles at tiny scale
(dispatch vs a capacity-free dense-equivalent), composition smoke, and
parallel-vs-single-device gradient parity on the virtual CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vitrs_tpu.config import ViTConfig, get_config
from vitrs_tpu import params as PRM
from vitrs_tpu.models import model as M
from vitrs_tpu.ops import moe
from vitrs_tpu.parallel import expert_parallel as EP


def _cfg(**kw):
    base = dict(max_seq_len=16, vocab_size=97, num_layers=2, num_heads=2,
                channels=16, num_experts=4, moe_top_k=2, use_flash=False)
    base.update(kw)
    return ViTConfig(**base).validate()


def _expert_weights(key, E, C, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    return dict(
        routerw=jax.random.normal(ks[0], (E, C), dtype) * 0.1,
        fcw=jax.random.normal(ks[1], (E, 4 * C, C), dtype) * 0.05,
        fcb=jax.random.normal(ks[2], (E, 4 * C), dtype) * 0.01,
        fcprojw=jax.random.normal(ks[3], (E, C, 4 * C), dtype) * 0.05,
        fcprojb=jax.random.normal(ks[4], (E, C), dtype) * 0.01)


# ---------------------------------------------------------------------------
# ops/moe.py unit behavior
# ---------------------------------------------------------------------------

def test_dispatch_matches_dense_equivalent_exactly():
    """At capacity high enough that nothing drops, the scatter/gather
    dispatch path must equal the run-every-expert oracle bit-for-bit (both
    compute each expert's FFN at the same dtype and combine in fp32)."""
    C, E = 16, 4
    w = _expert_weights(jax.random.PRNGKey(0), E, C)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, C))
    for k in (1, 2, 3):
        out, aux = moe.moe_mlp(x, w["routerw"], w["fcw"], w["fcb"],
                               w["fcprojw"], w["fcprojb"], top_k=k,
                               cap_factor=float(E))  # cap = S*k >= demand
        ref = moe.dense_equivalent(x, w["routerw"], w["fcw"], w["fcb"],
                                   w["fcprojw"], w["fcprojb"], top_k=k)
        # same expert FFNs, same fp32 combine — only the k-term summation
        # ORDER differs between the two paths, so agreement is to the ulp
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-7)
        assert float(aux.kept_fraction) == 1.0


def test_single_expert_is_dense_mlp():
    """E=1, top_k=1: softmax over one expert is 1.0 and nothing can drop, so
    the MoE layer must reproduce the dense MLP exactly."""
    from vitrs_tpu.ops import basic
    C = 16
    w = _expert_weights(jax.random.PRNGKey(2), 1, C)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, C))
    out, _ = moe.moe_mlp(x, w["routerw"], w["fcw"], w["fcb"], w["fcprojw"],
                         w["fcprojb"], top_k=1, cap_factor=1.0)
    dense = basic.linear(basic.gelu(basic.linear(x, w["fcw"][0], w["fcb"][0])),
                         w["fcprojw"][0], w["fcprojb"][0])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(dense))


def test_capacity_drops_are_bounded_and_finite():
    """cap_factor << 1 forces drops: kept_fraction < 1, and a dropped
    token's output is exactly the weighted sum of its surviving experts."""
    C, E = 16, 4
    w = _expert_weights(jax.random.PRNGKey(4), E, C)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 64, C))
    out, aux = moe.moe_mlp(x, w["routerw"], w["fcw"], w["fcb"],
                           w["fcprojw"], w["fcprojb"], top_k=2,
                           cap_factor=0.25)
    assert float(aux.kept_fraction) < 1.0
    assert np.isfinite(np.asarray(out)).all()
    # capacity respected exactly: no slot written twice (scatter is set, not
    # add) — per-expert occupancy equals min(demand, cap) by construction;
    # check via the router's own bookkeeping
    S = 64
    cap = moe.capacity(S, E, 2, 0.25)
    dst, _, keep, _ = moe.router(x.reshape(S, C), w["routerw"], 2, cap)
    used = np.asarray(dst)[np.asarray(keep)]
    assert len(np.unique(used)) == len(used), "slot collision"


def test_router_aux_near_one_at_uniform():
    """Random tiny router weights ≈ uniform probs → load-balance ≈ 1.0
    (its minimum under a uniform distribution)."""
    C, E = 16, 8
    w = _expert_weights(jax.random.PRNGKey(6), E, C)
    x = jax.random.normal(jax.random.PRNGKey(7), (4, 32, C))
    _, aux = moe.moe_mlp(x, w["routerw"] * 0.01, w["fcw"], w["fcb"],
                         w["fcprojw"], w["fcprojb"], top_k=2, cap_factor=2.0)
    assert 0.9 < float(aux.load_balance) < 1.3
    assert float(aux.z_loss) >= 0.0


def test_capacity_is_static_and_sublane_aligned():
    assert moe.capacity(1024, 8, 2, 1.25) % 8 == 0
    assert moe.capacity(8, 8, 1, 1.0) == 8          # floor
    assert moe.capacity(64, 4, 2, 1.0) == 32        # exact fit


# ---------------------------------------------------------------------------
# model integration
# ---------------------------------------------------------------------------

def test_moe_param_model():
    cfg = _cfg()
    shapes = PRM.param_shapes(cfg)
    L, E, C = cfg.num_layers, cfg.num_experts, cfg.channels
    assert shapes["fcw"] == (L, E, 4 * C, C)
    assert shapes["routerw"] == (L, E, C)
    assert PRM.tensor_order(cfg)[-1] == "routerw"
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    flat = PRM.flatten_params(p, cfg)
    assert flat.shape[0] == PRM.num_parameters(cfg)
    back = PRM.unflatten_params(flat, cfg)
    for k in p:
        np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(back[k]))


def test_moe_gpt_loss_and_grads_finite():
    cfg = _cfg()
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 97)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 97)
    loss, g = jax.value_and_grad(M.gpt_loss)(p, toks, tgt, cfg)
    assert np.isfinite(float(loss))
    for k, v in g.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # the router must actually receive gradient (it only gets one through
    # the combine weights — a silent zero here means the routing is dead)
    assert float(jnp.max(jnp.abs(g["routerw"]))) > 0.0


def test_moe_aux_weight_moves_loss():
    cfg = _cfg()
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 97)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 97)
    l0 = float(M.gpt_loss(p, toks, tgt, cfg.replace(moe_aux_weight=0.0,
                                                    moe_zloss_weight=0.0)))
    l1 = float(M.gpt_loss(p, toks, tgt, cfg))
    assert l1 > l0  # aux terms are positive


def test_moe_remat_full_matches_no_remat():
    cfg = _cfg()
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 97)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 97)
    g0 = jax.grad(M.gpt_loss)(p, toks, tgt, cfg)
    g1 = jax.grad(M.gpt_loss)(p, toks, tgt, cfg.replace(remat="full"))
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=1e-5, atol=1e-7)


def test_moe_vit_mode():
    """V-MoE-style vision path: same ops/moe.py layer under the vit block."""
    cfg = ViTConfig(mode="vit", img_size=16, patch_size=4, num_classes=10,
                    max_seq_len=17, vocab_size=10, num_layers=2, num_heads=2,
                    channels=16, num_experts=4, use_flash=False).validate()
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    imgs = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    labels = jnp.array([3, 7])
    loss, g = jax.value_and_grad(M.vit_loss)(p, imgs, labels, cfg)
    assert np.isfinite(float(loss))
    assert float(jnp.max(jnp.abs(g["routerw"]))) > 0.0


def test_moe_checkpoint_round_trip(tmp_path):
    from vitrs_tpu import checkpoint as CKPT
    cfg = _cfg()
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    path = str(tmp_path / "moe.bin")
    CKPT.save_checkpoint(path, p, cfg, step=7, seed=3)
    p2, cfg2, extras = CKPT.load_checkpoint(path)
    assert cfg2.num_experts == 4 and cfg2.moe_top_k == 2
    assert extras["step"] == 7
    for k in p:
        np.testing.assert_array_equal(np.asarray(p[k]), np.asarray(p2[k]))


def test_moe_preset_validates():
    cfg = get_config("gpt2-moe-8e")
    assert cfg.num_experts == 8 and cfg.moe_top_k == 2
    n = PRM.num_parameters(cfg)
    assert n > 4 * 124_439_808  # ~8x the dense MLP block of 124M


# ---------------------------------------------------------------------------
# expert parallelism (8-virtual-device CPU mesh)
# ---------------------------------------------------------------------------

def _ep_grads(cfg, pnp, toks, tgt, dp, ep):
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    mesh = EP.make_mesh_dp_ep(dp, ep)
    specs = EP.ep_param_specs(cfg)

    def spmd(params, inputs, targets):
        def gl(pa):
            return jax.lax.pmean(
                M.gpt_loss(pa, inputs, targets, cfg, ep_axis="expert",
                           ep=mesh.shape["expert"]), ("data", "expert"))
        l, g = jax.value_and_grad(gl)(params)
        inv = 1.0 / mesh.size
        g = {k: jax.lax.psum(gr, ("data",) if k in EP.EXPERT_KEYS
                             else ("data", "expert")) * inv
             for k, gr in g.items()}
        return l, g

    f = jax.jit(shard_map(spmd, mesh=mesh,
                          in_specs=(specs, P(("data", "expert")),
                                    P(("data", "expert"))),
                          out_specs=(P(), specs), check_rep=False))
    pp = {k: jax.device_put(v, jax.NamedSharding(mesh, specs[k]))
          for k, v in pnp.items()}
    l, g = f(pp, EP.shard_batch(toks, mesh), EP.shard_batch(tgt, mesh))
    return float(l), {k: np.asarray(jax.device_get(v)) for k, v in g.items()}


@pytest.mark.parametrize("dp,ep", [(2, 4), (4, 2)])
def test_ep_grad_parity_vs_single_device(dp, ep):
    """dp×ep gradients == single-device gradients when nothing drops.
    aux_weight=0 isolates the linear part of the loss (the load-balance
    term is intentionally per-device-local — see expert_parallel.py)."""
    cfg = _cfg(moe_cap_factor=8.0, moe_aux_weight=0.0)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    pnp = {k: np.asarray(v) for k, v in p.items()}
    toks = np.asarray(jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 97))
    tgt = np.asarray(jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, 97))
    loss_ref, g_ref = jax.value_and_grad(M.gpt_loss)(p, jnp.asarray(toks),
                                                     jnp.asarray(tgt), cfg)
    l, g = _ep_grads(cfg, pnp, toks, tgt, dp, ep)
    assert abs(l - float(loss_ref)) < 1e-5
    for k in g_ref:
        a = np.asarray(g_ref[k], np.float64)
        np.testing.assert_allclose(g[k], a, rtol=2e-4,
                                   atol=2e-6 * max(1.0, np.abs(a).max()),
                                   err_msg=k)


def test_ep_train_step_loss_decreases():
    cfg = _cfg(moe_cap_factor=4.0)
    mesh = EP.make_mesh_dp_ep(2, 4)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    pp = EP.place_ep_params(p, cfg, mesh)
    m, v = EP.init_ep_opt_state(pp, cfg, mesh)
    step_fn = EP.make_ep_train_step(cfg, mesh)
    toks = EP.shard_batch(np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 97)), mesh)
    tgt = EP.shard_batch(np.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, 97)), mesh)
    losses = []
    for i in range(8):
        pp, m, v, loss = step_fn(pp, m, v, toks, tgt, jnp.asarray(i + 1),
                                 1e-2, 0.0)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses
    # expert slabs and their moments stayed sharded over "expert"
    spec = pp["fcw"].sharding.spec
    assert tuple(spec)[:2] == (None, "expert"), spec


# ---------------------------------------------------------------------------
# generation: KV-cache decode with the MoE MLP
# ---------------------------------------------------------------------------

def test_moe_cache_decode_matches_full_forward():
    """Prefill + incremental decode through the MoE block must reproduce the
    full-forward logits (same tokens, same routing decisions per position —
    decode routes each token alone, so capacity can never drop it)."""
    from vitrs_tpu.models import generate as G
    cfg = _cfg(moe_cap_factor=8.0)  # no train-side drops either
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 0, 97)
    full = M.gpt_forward(p, prompt, cfg)
    caches = G.init_kv_cache(cfg, 2, 16)
    lg, caches = G.forward_with_cache(p, prompt, caches, 0, cfg)
    np.testing.assert_allclose(np.asarray(lg), np.asarray(full),
                               rtol=2e-5, atol=2e-5)
    # one decode step
    nxt = jnp.argmax(lg[:, -1], axis=-1)[:, None]
    lg1, _ = G.forward_with_cache(p, nxt, caches, 8, cfg)
    full2 = M.gpt_forward(p, jnp.concatenate([prompt, nxt], 1), cfg)
    np.testing.assert_allclose(np.asarray(lg1[:, 0]),
                               np.asarray(full2[:, -1]),
                               rtol=2e-5, atol=2e-5)


def test_moe_greedy_generation_runs():
    from vitrs_tpu.models import generate as G
    cfg = _cfg()
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    prompt = jax.random.randint(jax.random.PRNGKey(1), (1, 4), 0, 97)
    out = G.generate(p, prompt, cfg, max_new=6, key=jax.random.PRNGKey(3),
                     temperature=0.0)
    assert out.shape == (1, 10)
    assert np.asarray((out >= 0) & (out < 97)).all()


def test_moe_selective_remat_matches_no_remat():
    """remat=True for MoE: lean attention branch + checkpointed MoE half
    (models/selective.block_moe_selective) — same grads as the plain path."""
    cfg = _cfg()
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    toks = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, 97)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, 97)
    g0 = jax.grad(M.gpt_loss)(p, toks, tgt, cfg)
    g1 = jax.grad(M.gpt_loss)(p, toks, tgt, cfg.replace(remat=True))
    for k in g0:
        np.testing.assert_allclose(np.asarray(g0[k]), np.asarray(g1[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


# ---------------------------------------------------------------------------
# Adafactor under EP (sharded factored optimizer state)
# ---------------------------------------------------------------------------

def test_ep_adafactor_parity_vs_single_device():
    """One dp×ep Adafactor step == one single-device AF.step on the
    full-batch gradients: the factored stats and RMS scalars are per
    trailing matrix/vector, so sharding the leading E axis is exactly
    semantics-preserving (the property documented in ops/adafactor.py)."""
    from vitrs_tpu.ops import adafactor as AF
    from vitrs_tpu.ops import optimizer as OPT
    cfg = _cfg(moe_cap_factor=8.0, moe_aux_weight=0.0)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    toks = np.asarray(jax.random.randint(jax.random.PRNGKey(1), (8, 16),
                                         0, 97))
    tgt = np.asarray(jax.random.randint(jax.random.PRNGKey(2), (8, 16),
                                        0, 97))
    _, g_ref = jax.value_and_grad(M.gpt_loss)(p, jnp.asarray(toks),
                                              jnp.asarray(tgt), cfg)
    st0 = AF.init_state(p)
    p_1, _ = AF.step(p, g_ref, st0, jnp.asarray(1), 0.01, weight_decay=0.1,
                     decay_mask=OPT.decay_mask_2d(p))
    p_1 = jax.device_get(p_1)

    mesh = EP.make_mesh_dp_ep(2, 4)
    pp = EP.place_ep_params({k: np.asarray(v) for k, v in p.items()},
                            cfg, mesh)
    st = EP.init_ep_af_state(pp, cfg, mesh)
    step_fn = EP.make_ep_train_step_adafactor(cfg, mesh)
    pp, st, _ = step_fn(pp, st, EP.shard_batch(toks, mesh),
                        EP.shard_batch(tgt, mesh),
                        jnp.asarray(1, jnp.int32),
                        jnp.asarray(0.01, jnp.float32),
                        jnp.asarray(0.1, jnp.float32))
    for k in p_1:
        a = np.asarray(p_1[k], np.float64)
        np.testing.assert_allclose(np.asarray(jax.device_get(pp[k])), a,
                                   rtol=1e-4,
                                   atol=5e-5 * max(1.0, np.abs(a).max()),
                                   err_msg=k)


def test_ep_adafactor_state_sharded_and_loss_decreases():
    cfg = _cfg(moe_cap_factor=4.0)
    mesh = EP.make_mesh_dp_ep(2, 4)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    pp = EP.place_ep_params(p, cfg, mesh)
    st = EP.init_ep_af_state(pp, cfg, mesh)
    # expert full-v (bias stacks) and factored stats stay expert-sharded
    assert tuple(st.vf["fcb"].sharding.spec)[:2] == (None, "expert")
    step_fn = EP.make_ep_train_step_adafactor(cfg, mesh)
    toks = EP.shard_batch(np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 97)), mesh)
    tgt = EP.shard_batch(np.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, 97)), mesh)
    losses = []
    for i in range(20):
        # relative-step alpha (lr·RMS(p)) ramps slowly from trunc-normal
        # init — 20 steps for a clear drop (same contract as the dense
        # Adafactor loss test)
        pp, st, loss = step_fn(pp, st, toks, tgt,
                               jnp.asarray(i + 1, jnp.int32),
                               jnp.asarray(0.05, jnp.float32),
                               jnp.asarray(0.0, jnp.float32))
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses


# ---------------------------------------------------------------------------
# EP x TP: experts over "expert", attention + per-expert FFN over "model"
# ---------------------------------------------------------------------------

def _ep_tp_grads(cfg, pnp, toks, tgt, dp, ep, tp):
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    mesh = EP.make_mesh_dp_ep_tp(dp, ep, tp)
    specs = EP.ep_tp_param_specs(cfg)

    def spmd(params, inputs, targets):
        def gl(pa):
            return jax.lax.pmean(
                EP._ep_tp_loss(pa, inputs, targets, cfg, ep),
                ("data", "expert"))
        l, g = jax.value_and_grad(gl)(params)
        inv = 1.0 / (dp * ep)
        g = {k: jax.lax.psum(gr, ("data",) if k in EP.EXPERT_KEYS
                             else ("data", "expert")) * inv
             for k, gr in g.items()}
        return l, g

    f = jax.jit(shard_map(spmd, mesh=mesh,
                          in_specs=(specs, P(("data", "expert")),
                                    P(("data", "expert"))),
                          out_specs=(P(), specs), check_rep=False))
    pp = EP.place_ep_tp_params(pnp, cfg, mesh)
    bs = jax.NamedSharding(mesh, P(("data", "expert")))
    l, g = f(pp, jax.device_put(toks, bs), jax.device_put(tgt, bs))
    host = {k: np.asarray(jax.device_get(v)) for k, v in g.items()}
    return float(l), EP.from_ep_tp_params(
        {k: jnp.asarray(v) for k, v in host.items()}, cfg)


@pytest.mark.parametrize("dp,ep,tp", [(2, 2, 2), (1, 4, 2)])
def test_ep_tp_grad_parity_vs_single_device(dp, ep, tp):
    """dp x ep x tp gradients == single-device gradients when nothing
    drops (aux_weight=0 — the load-balance term is per-cell-local, same
    contract as the dp x ep parity test)."""
    cfg = _cfg(moe_cap_factor=8.0, moe_aux_weight=0.0)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    pnp = {k: np.asarray(v) for k, v in p.items()}
    toks = np.asarray(jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 97))
    tgt = np.asarray(jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, 97))
    loss_ref, g_ref = jax.value_and_grad(M.gpt_loss)(p, jnp.asarray(toks),
                                                     jnp.asarray(tgt), cfg)
    l, g = _ep_tp_grads(cfg, pnp, toks, tgt, dp, ep, tp)
    assert abs(l - float(loss_ref)) < 1e-5
    for k in g_ref:
        a = np.asarray(g_ref[k], np.float64)
        np.testing.assert_allclose(np.asarray(g[k]), a, rtol=2e-4,
                                   atol=2e-6 * max(1.0, np.abs(a).max()),
                                   err_msg=k)


def test_ep_tp_train_step_loss_decreases():
    cfg = _cfg(moe_cap_factor=4.0)
    mesh = EP.make_mesh_dp_ep_tp(2, 2, 2)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    pp = EP.place_ep_tp_params(p, cfg, mesh)
    m, v = EP.init_ep_tp_opt_state(pp, cfg, mesh)
    step_fn = EP.make_ep_tp_train_step(cfg, mesh)
    from jax.sharding import PartitionSpec as P
    bs = jax.NamedSharding(mesh, P(("data", "expert")))
    toks = jax.device_put(np.asarray(
        jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 97)), bs)
    tgt = jax.device_put(np.asarray(
        jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, 97)), bs)
    losses = []
    for i in range(8):
        pp, m, v, loss = step_fn(pp, m, v, toks, tgt, jnp.asarray(i + 1),
                                 1e-2, 0.0)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses
    # expert slabs sharded over BOTH expert and model; m mirrors them
    assert tuple(pp["fcw"].sharding.spec)[:3] == (None, "expert", "model")
    assert tuple(m["fcw"].sharding.spec)[:3] == (None, "expert", "model")
    # canonical round-trip preserves leaf shapes (checkpoint contract)
    canon = EP.from_ep_tp_params(
        {k: jnp.asarray(jax.device_get(v)) for k, v in pp.items()}, cfg)
    shapes = PRM.param_shapes(cfg)
    for k, s in shapes.items():
        assert tuple(canon[k].shape) == tuple(s), (k, canon[k].shape, s)


@pytest.mark.parametrize("dp,ep,tp", [(2, 2, 2)])
def test_ep_tp_vocab_parallel_grad_parity(dp, ep, tp):
    """EP x TP with the Megatron vocab-parallel embedding + head/CE: the
    full (B, T, V) logits (the top allocation in the MoE B=32 OOM) never
    materialize, and the gradients still equal the single-device model."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    cfg = _cfg(moe_cap_factor=8.0, moe_aux_weight=0.0)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    pnp = {k: np.asarray(v) for k, v in p.items()}
    toks = np.asarray(jax.random.randint(jax.random.PRNGKey(1), (8, 16), 0, 97))
    tgt = np.asarray(jax.random.randint(jax.random.PRNGKey(2), (8, 16), 0, 97))
    loss_ref, g_ref = jax.value_and_grad(M.gpt_loss)(p, jnp.asarray(toks),
                                                     jnp.asarray(tgt), cfg)
    mesh = EP.make_mesh_dp_ep_tp(dp, ep, tp)
    specs = EP.ep_tp_param_specs(cfg, vocab_parallel=True)
    assert tuple(specs["wte"]) == ("model", None)

    def spmd(params, inputs, targets):
        def gl(pa):
            return jax.lax.pmean(
                EP._ep_tp_loss(pa, inputs, targets, cfg, ep, True),
                ("data", "expert"))
        l, g = jax.value_and_grad(gl)(params)
        inv = 1.0 / (dp * ep)
        g = {k: jax.lax.psum(gr, ("data",) if k in EP.EXPERT_KEYS
                             else ("data", "expert")) * inv
             for k, gr in g.items()}
        return l, g

    f = jax.jit(shard_map(spmd, mesh=mesh,
                          in_specs=(specs, P(("data", "expert")),
                                    P(("data", "expert"))),
                          out_specs=(P(), specs), check_rep=False))
    pp = EP.place_ep_tp_params(pnp, cfg, mesh, vocab_parallel=True)
    bs = jax.NamedSharding(mesh, P(("data", "expert")))
    l, g = f(pp, jax.device_put(toks, bs), jax.device_put(tgt, bs))
    assert abs(float(l) - float(loss_ref)) < 2e-5
    got = EP.from_ep_tp_params(
        {k: jnp.asarray(np.asarray(jax.device_get(v))) for k, v in g.items()},
        cfg, vocab_parallel=True)
    for k in g_ref:
        a = np.asarray(g_ref[k], np.float64)
        np.testing.assert_allclose(np.asarray(got[k]), a, rtol=3e-4,
                                   atol=3e-6 * max(1.0, np.abs(a).max()),
                                   err_msg=k)


# ---------------------------------------------------------------------------
# MoE through the pipeline (GPipe schedule)
# ---------------------------------------------------------------------------

def test_moe_pp_grad_parity_vs_single_device():
    """MoE under GPipe pipeline parallelism: the tick scan carries the
    per-stage router aux (gated to in-flight microbatches; bubble ticks
    contribute zero), and gradients equal the single-device model when
    nothing drops.  aux_weight=0: the load-balance term is per-MICROBATCH
    here (quadratic in the token set, like the EP per-device convention);
    the z-loss is token-linear and stays on."""
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from vitrs_tpu.parallel import pipeline as PP
    cfg = _cfg(num_layers=2, moe_cap_factor=8.0, moe_aux_weight=0.0)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    toks = jnp.asarray(jax.random.randint(jax.random.PRNGKey(1), (8, 16),
                                          0, 97))
    tgt = jnp.asarray(jax.random.randint(jax.random.PRNGKey(2), (8, 16),
                                         0, 97))
    # single-device reference at the SAME microbatching: the z-loss is
    # token-linear (mean over microbatches == full mean), but capacity and
    # routing run per microbatch in the pipeline — evaluate the reference
    # per microbatch too (cap high => no drops on either side)
    loss_ref, g_ref = jax.value_and_grad(
        lambda pa: (M.gpt_loss(pa, toks[:4], tgt[:4], cfg)
                    + M.gpt_loss(pa, toks[4:], tgt[4:], cfg)) / 2.0)(p)

    mesh = PP.make_mesh_dp_pp(1, 2)
    specs = PP.pp_param_specs(cfg)
    assert tuple(specs["routerw"]) == ("pipe",)

    def spmd(pp_, x, y):
        loss, g = jax.value_and_grad(PP._pp_loss)(pp_, x, y, cfg, 2, 2)
        g = {k: (jax.lax.psum(v, "pipe") if specs[k] == P() else v)
             for k, v in g.items()}
        return loss, g

    f = jax.jit(shard_map(spmd, mesh=mesh,
                          in_specs=(dict(specs), P("data"), P("data")),
                          out_specs=(P(), dict(specs)), check_rep=False))
    pnp = {k: np.asarray(v) for k, v in p.items()}
    placed = PP.place_pp_params(pnp, cfg, mesh)
    bs = jax.NamedSharding(mesh, P("data"))
    l, g = f(placed, jax.device_put(np.asarray(toks), bs),
             jax.device_put(np.asarray(tgt), bs))
    assert abs(float(l) - float(loss_ref)) < 2e-5, (float(l), float(loss_ref))
    for k in g_ref:
        a = np.asarray(g_ref[k], np.float64)
        np.testing.assert_allclose(np.asarray(jax.device_get(g[k])), a,
                                   rtol=3e-4,
                                   atol=3e-6 * max(1.0, np.abs(a).max()),
                                   err_msg=k)


def test_moe_pp_train_step_loss_decreases():
    from jax.sharding import PartitionSpec as P
    from vitrs_tpu.parallel import pipeline as PP
    cfg = _cfg(num_layers=2, moe_cap_factor=4.0)
    mesh = PP.make_mesh_dp_pp(2, 2)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    placed = PP.place_pp_params({k: np.asarray(v) for k, v in p.items()},
                                cfg, mesh)
    m, v = PP.init_pp_opt_state(placed, mesh, cfg)
    step_fn = PP.make_pp_train_step(cfg, mesh, microbatches=2)
    bs = jax.NamedSharding(mesh, P("data"))
    toks = jax.device_put(np.asarray(jax.random.randint(
        jax.random.PRNGKey(1), (8, 16), 0, 97)), bs)
    tgt = jax.device_put(np.asarray(jax.random.randint(
        jax.random.PRNGKey(2), (8, 16), 0, 97)), bs)
    losses = []
    for i in range(8):
        placed, m, v, loss = step_fn(placed, m, v, toks, tgt,
                                     jnp.asarray(i + 1), 1e-2, 0.0)
        losses.append(float(loss))
    assert losses[-1] < losses[0] - 0.5, losses
