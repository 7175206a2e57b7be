"""Adafactor (ops/adafactor.py): factored-second-moment exactness on
rank-1 g² structure, vector full-v parity, stacked-layout semantics,
memory footprint, and end-to-end loss decrease."""

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu.ops import adafactor as AF


def test_rank1_g2_factored_equals_full():
    """When g² is exactly rank-1 (g²_ij = a_i·b_j), the factored estimate
    (vr⊗vc)/mean(vr) reconstructs the full second moment exactly at step 1,
    so the update must equal the unfactored g/sqrt(v̂) (then RMS-clipped)."""
    a = jnp.asarray([1.0, 4.0, 9.0, 16.0])
    b = jnp.asarray([0.25, 1.0, 2.25])
    g = jnp.sqrt(a[:, None] * b[None, :])           # g² = a⊗b exactly
    p = jnp.zeros((4, 3))
    st = AF.init_state({"w": p}, min_factor=2)
    newp, st2 = AF.step({"w": p}, {"w": g}, st, jnp.asarray(1), 0.1,
                        relative_step=False, min_factor=2)
    # β2_1 = 1 - 1^-0.8 = 0 → vr/vc are exactly the row/col means of g²+eps
    g2 = np.asarray(g) ** 2 + AF.EPS1
    vhat = (g2.mean(1, keepdims=True) * g2.mean(0, keepdims=True)
            / g2.mean())
    u = np.asarray(g) / np.sqrt(vhat)
    u = u / max(1.0, np.sqrt((u ** 2).mean()) / AF.CLIP_D)
    np.testing.assert_allclose(np.asarray(newp["w"]), -0.1 * u, rtol=1e-5)


def test_vector_full_second_moment():
    g = jnp.asarray([3.0, -4.0])
    p = jnp.zeros((2,))
    st = AF.init_state({"b": p})
    newp, _ = AF.step({"b": p}, {"b": g}, st, jnp.asarray(1), 0.5,
                      relative_step=False)
    u = np.asarray(g) / np.sqrt(np.asarray(g) ** 2 + AF.EPS1)
    u = u / max(1.0, np.sqrt((u ** 2).mean()) / AF.CLIP_D)
    np.testing.assert_allclose(np.asarray(newp["b"]), -0.5 * u, rtol=1e-5)


def test_stacked_factorization_is_per_matrix():
    """(L, OC, IC) leaves factor each layer's matrix independently — the
    stacked step must equal L separate 2-D steps."""
    key = jax.random.PRNGKey(0)
    L, OC, IC = 3, 8, 5
    p = jax.random.normal(key, (L, OC, IC))
    g = jax.random.normal(jax.random.PRNGKey(1), (L, OC, IC))
    st = AF.init_state({"w": p}, min_factor=2)
    stacked, _ = AF.step({"w": p}, {"w": g}, st, jnp.asarray(3), 0.01,
                         relative_step=False, min_factor=2)
    for l in range(L):
        st_l = AF.init_state({"w": p[l]}, min_factor=2)
        one, _ = AF.step({"w": p[l]}, {"w": g[l]}, st_l, jnp.asarray(3),
                         0.01, relative_step=False, min_factor=2)
        # EXACT equality: the RMS update clip is per trailing matrix (the
        # paper's unit), so the stacked step == L independent 2-D steps —
        # the invariance the expert-parallel Adafactor mode shards by
        np.testing.assert_allclose(np.asarray(stacked["w"][l]),
                                   np.asarray(one["w"]), rtol=1e-6)


def test_state_is_sublinear():
    """At real model scale (GPT-2 124M shapes, structurally via eval_shape)
    the factored state is <2% of param bytes — matrices ≥ MIN_FACTOR factor,
    and the full-v biases/LN stacks are a negligible fraction."""
    from vitrs_tpu.config import get_config
    from vitrs_tpu import params as PRM
    cfg = get_config("gpt2-124m")
    structs = {k: jax.ShapeDtypeStruct(s, jnp.float32)
               for k, s in PRM.param_shapes(cfg).items()}
    st = jax.eval_shape(AF.init_state, structs)
    n_param_bytes = sum(int(np.prod(s.shape)) * 4 for s in structs.values())
    assert AF.state_bytes(st) < 0.02 * n_param_bytes, (
        AF.state_bytes(st), n_param_bytes)
    # beta1 > 0 adds one param-copy of momentum
    st_m = jax.eval_shape(lambda p: AF.init_state(p, beta1=0.9), structs)
    assert AF.state_bytes(st_m) > n_param_bytes


def test_gpt_nano_loss_decreases():
    from vitrs_tpu.config import get_config
    from vitrs_tpu import params as PRM
    from vitrs_tpu.models import model as M
    from vitrs_tpu.ops import optimizer as OPT
    cfg = get_config("gpt-nano", use_flash=False)
    p = PRM.init_params(cfg, jax.random.PRNGKey(0))
    st = AF.init_state(p)
    toks = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 97)
    tgt = jax.random.randint(jax.random.PRNGKey(2), (4, 16), 0, 97)
    mask = OPT.decay_mask_2d(p)

    @jax.jit
    def train(p, st, t):
        loss, g = jax.value_and_grad(M.gpt_loss)(p, toks, tgt, cfg)
        p, st = AF.step(p, g, st, t, 0.05, weight_decay=1e-4,
                        decay_mask=mask)
        return p, st, loss

    losses = []
    for i in range(25):
        p, st, loss = train(p, st, jnp.asarray(i + 1))
        losses.append(float(loss))
    # relative-step scaling (alpha = lr·RMS(p)) starts slow at trunc-normal
    # init — steady monotone descent is the contract, not a fixed drop
    assert losses[-1] < losses[0] - 0.5, losses
    assert all(b < a + 1e-3 for a, b in zip(losses, losses[1:])), losses


def test_dp_adafactor_step_matches_single_device():
    """The shard_map DP Adafactor step must equal a single-device step on
    the full batch (pmean'd tree grads == full-batch grads)."""
    from vitrs_tpu.config import get_config
    from vitrs_tpu import params as PRM
    from vitrs_tpu.models import model as M
    from vitrs_tpu.ops import optimizer as OPT
    from vitrs_tpu.parallel import data_parallel as dp
    cfg = get_config("gpt-nano", use_flash=False)
    mesh = dp.make_mesh(4)
    params = PRM.init_params(cfg, jax.random.PRNGKey(4))
    state = AF.init_state(params)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 16)))
    y = jnp.asarray(np.roll(np.asarray(x), -1, axis=1))

    loss, g = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)
    p_1, _ = AF.step(params, g, state, jnp.asarray(1), 0.01,
                     weight_decay=0.1, decay_mask=OPT.decay_mask_2d(params))
    p_1 = jax.device_get(p_1)

    step_fn = dp.make_dp_train_step_adafactor(cfg, mesh)
    p_dp, st_dp, loss_dp = step_fn(
        dp.replicate(params, mesh), dp.replicate(state, mesh),
        dp.shard_batch(x, mesh), dp.shard_batch(y, mesh),
        jnp.asarray(1, jnp.int32), jnp.asarray(0.01, jnp.float32),
        jnp.asarray(0.1, jnp.float32))
    np.testing.assert_allclose(float(loss_dp), float(loss), rtol=1e-6)
    for k in p_1:
        # u = g·rsqrt(v̂) amplifies the fp32 reduction-order difference
        # (pmean-of-shard-means vs full-batch mean) to ±1-scale sign flips
        # where g ≈ 0; the |update| scale here is ~1e-2·lr, so a wiring
        # error would be O(1e-4) absolute — assert well below that
        np.testing.assert_allclose(np.asarray(p_dp[k]), np.asarray(p_1[k]),
                                   rtol=1e-4, atol=5e-5, err_msg=k)


def test_train_loop_adafactor_resume(tmp_path):
    """Kill-and-resume under --optimizer adafactor: the side-tree state
    (vr/vc/vf + cursor in its meta) must make 2+2 == 4 straight steps."""
    import os
    from vitrs_tpu import checkpoint as C
    from vitrs_tpu.train.loop import TrainConfig, train
    common = dict(preset="gpt-nano", dataset="tokens", steps=4,
                  batch_size=8, lr=0.01, warmup=2, dtype="float32",
                  log_every=2, eval_every=0, seed=3, optimizer="adafactor",
                  async_ckpt=False, model_overrides=dict(use_flash=False))
    w1 = str(tmp_path / "straight")
    train(TrainConfig(workdir=w1, ckpt_every=4, **common))
    w2 = str(tmp_path / "resumed")
    train(TrainConfig(workdir=w2, ckpt_every=2, run_steps=2, **common))
    train(TrainConfig(workdir=w2, ckpt_every=2, **common))
    p1, _, _ = C.load_checkpoint(os.path.join(w1, "ckpt_00000004.bin"))
    p2, _, _ = C.load_checkpoint(os.path.join(w2, "ckpt_00000004.bin"))
    for k in p1:
        np.testing.assert_allclose(p1[k], p2[k], rtol=2e-6, atol=1e-7,
                                   err_msg=k)


def test_wsd_schedule_shape():
    from vitrs_tpu.ops.optimizer import wsd_lr_host
    total, warmup = 1000, 100
    assert wsd_lr_host(0, 1.0, warmup, total) == 0.0
    assert wsd_lr_host(50, 1.0, warmup, total) == 0.5
    # plateau: flat at base_lr from warmup to the cooldown start
    for s in (100, 300, 600, 899):
        assert wsd_lr_host(s, 1.0, warmup, total) == 1.0
    # linear cooldown over the last 10%
    assert abs(wsd_lr_host(950, 1.0, warmup, total) - 0.5) < 1e-6
    assert abs(wsd_lr_host(1000, 1.0, warmup, total, min_lr=0.1) - 0.1) < 1e-6
    # extending `total` preserves every pre-cooldown value (the WSD point)
    for s in (100, 300, 600, 899):
        assert wsd_lr_host(s, 1.0, warmup, 2000) == \
            wsd_lr_host(s, 1.0, warmup, total)


def test_tp_adafactor_parity_vs_single_device():
    """TP Adafactor (gathered-stats semantics: pmean-completed row/col
    means, global-shape factoring) must match the single-device step.
    min_factor=2 makes the tiny matrices factor, so BOTH the sharded-row
    (qkv3w/fcw, sd=-2) and sharded-col (attprojw/fcprojw, sd=-1) factored
    paths are exercised."""
    from vitrs_tpu.config import get_config
    from vitrs_tpu import params as PRM
    from vitrs_tpu.models import model as M
    from vitrs_tpu.ops import optimizer as OPT
    from vitrs_tpu.parallel import tensor_parallel as TP
    cfg = get_config("gpt-nano", use_flash=False)
    params = PRM.init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 16)))
    y = jnp.asarray(np.roll(np.asarray(x), -1, axis=1))
    MF = 2

    # single-device reference on the TP pytree layout (qkv3w reshape is a
    # pure view — same update math, directly comparable leaves)
    tpp = TP.to_tp_params(params, cfg)
    st0 = AF.init_state(tpp, min_factor=MF)
    loss, g = jax.value_and_grad(
        lambda p: M.gpt_loss(TP.from_tp_params(p, cfg), x, y, cfg))(tpp)
    mask = OPT.decay_mask_2d(tpp)
    p_ref, st_ref = AF.step(tpp, g, st0, jnp.asarray(1), 0.01,
                            weight_decay=0.1, decay_mask=mask, min_factor=MF)
    p_ref = jax.device_get(p_ref)

    pnp = {k: np.asarray(v) for k, v in params.items()}
    for dp_, tp_ in [(2, 2), (4, 2)]:
        mesh = TP.make_mesh_2d(dp_, tp_)
        # place from host copies: the step donates its inputs, and a
        # replicated device_put of a live jnp array can alias it on CPU
        placed = TP.place_tp_params(pnp, cfg, mesh)
        st = TP.init_tp_af_state(placed, mesh, cfg, min_factor=MF)
        step_fn = TP.make_tp_train_step_adafactor(cfg, mesh, min_factor=MF)
        from jax.sharding import PartitionSpec as P
        bs = jax.NamedSharding(mesh, P("data"))
        p_tp, st_tp, loss_tp = step_fn(
            placed, st, jax.device_put(x, bs), jax.device_put(y, bs),
            jnp.asarray(1, jnp.int32), jnp.asarray(0.01, jnp.float32),
            jnp.asarray(0.1, jnp.float32))
        np.testing.assert_allclose(float(loss_tp), float(loss), rtol=1e-5)
        for k in p_ref:
            # atol rationale (same class as the dp parity test's note): the
            # packed K-bias rows have EXACTLY zero gradient in exact
            # arithmetic (a constant added to every key shifts each query's
            # scores uniformly — softmax-invariant), so their fp32 grads
            # are ~1e-13 noise that legitimately differs between the TP and
            # single-device programs; u = g·rsqrt(v̂) normalizes that noise
            # to O(1) and the per-matrix clip couples it into the rest of
            # qkv3b (measured ≤ 7.2e-5 absolute).  Real-gradient leaves
            # (wte, fcw, ...) agree to ~2e-9, which is where a wiring error
            # (missing pmean, wrong shard_axes entry) would show up.
            np.testing.assert_allclose(
                np.asarray(jax.device_get(p_tp[k])), np.asarray(p_ref[k]),
                rtol=1e-4, atol=2e-4, err_msg=f"tp={tp_} {k}")
        # factored stats stay sharded with their rows/cols at rest
        assert "model" in jax.tree_util.tree_leaves(
            [tuple(st_tp.vr["qkv3w"].sharding.spec)])


def test_fsdp_adafactor_parity_and_loss_decreases():
    """FSDP Adafactor is plain global-view AF.step under GSPMD — parity
    with single device is exact by construction; verify it, plus descent
    and state sharding at rest."""
    from vitrs_tpu.config import get_config
    from vitrs_tpu import params as PRM
    from vitrs_tpu.models import model as M
    from vitrs_tpu.ops import optimizer as OPT
    from vitrs_tpu.parallel import fsdp as FS
    cfg = get_config("gpt-nano", use_flash=False)
    mesh = FS.make_mesh(8)
    params = PRM.init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 16)))
    y = jnp.asarray(np.roll(np.asarray(x), -1, axis=1))
    MF = 2

    st0 = AF.init_state(params, min_factor=MF)
    loss, g = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)
    p_ref, _ = AF.step(params, g, st0, jnp.asarray(1), 0.01,
                       weight_decay=0.1,
                       decay_mask=OPT.decay_mask_2d(params), min_factor=MF)
    p_ref = jax.device_get(p_ref)

    placed = FS.place_params(params, mesh)
    st = FS.init_af_state(placed, mesh, min_factor=MF)
    step_fn = FS.make_fsdp_train_step_adafactor(cfg, mesh, placed,
                                                min_factor=MF)
    xb = jax.device_put(x, jax.NamedSharding(mesh, jax.sharding.PartitionSpec(FS.AXIS)))
    yb = jax.device_put(y, jax.NamedSharding(mesh, jax.sharding.PartitionSpec(FS.AXIS)))
    p1, st1, loss1 = step_fn(placed, st, xb, yb,
                             jnp.asarray(1, jnp.int32),
                             jnp.asarray(0.01, jnp.float32),
                             jnp.asarray(0.1, jnp.float32))
    np.testing.assert_allclose(float(loss1), float(loss), rtol=1e-6)
    for k in p_ref:
        # same atol rationale as the TP test above: GSPMD reorders the
        # grad/stat reductions, and the exactly-zero-gradient K-bias rows
        # amplify that to ~3e-5 absolute via u = g·rsqrt(v̂)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(p1[k])), np.asarray(p_ref[k]),
            rtol=1e-4, atol=2e-4, err_msg=k)
    # elementwise-v leaves (bias stacks) shard like their params at rest
    assert any("fsdp" in str(v.sharding.spec) for v in st1.vf.values())
    losses = [float(loss1)]
    for i in range(2, 16):
        p1, st1, l = step_fn(p1, st1, xb, yb, jnp.asarray(i, jnp.int32),
                             jnp.asarray(0.05, jnp.float32),
                             jnp.asarray(0.0, jnp.float32))
        losses.append(float(l))
    assert losses[-1] < losses[0] - 0.3, losses


def test_pp_adafactor_parity_vs_single_device():
    """Adafactor under pipeline parallelism: the pipe axis slices the
    stacked-L leaves on their LEADING dim, to which the step is exactly
    invariant — each stage's plain AF.step must reproduce the single-device
    update given the same grads (GPipe grads themselves are parity-tested
    in test_pipeline.py)."""
    from vitrs_tpu.config import get_config
    from vitrs_tpu import params as PRM
    from vitrs_tpu.models import model as M
    from vitrs_tpu.ops import optimizer as OPT
    from vitrs_tpu.parallel import pipeline as PP
    cfg = get_config("gpt-nano", use_flash=False).replace(num_layers=4)
    params = PRM.init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 16)))
    y = jnp.asarray(np.roll(np.asarray(x), -1, axis=1))
    MF = 2

    # the PP factory forces full-v for ndim-2 block stacks (their trailing
    # "matrix" crosses the stacked-L axis the pipe slice cuts) — the
    # single-device reference must use the same layout to be comparable
    fac, _ = PP.pp_af_factored(cfg, MF)
    loss, g = jax.value_and_grad(M.loss_fn)(params, x, y, cfg)
    # zero state in the override layout
    st0 = AF.AdafactorState(
        *({k: jnp.zeros(p.shape[:-1] if fac[k] else (), jnp.float32)
           if f == "vr" else
           jnp.zeros(p.shape[:-2] + p.shape[-1:] if fac[k] else (),
                     jnp.float32)
           if f == "vc" else
           jnp.zeros(() if fac[k] else p.shape, jnp.float32)
           for k, p in params.items()} for f in ("vr", "vc", "vf")), {})
    p_ref, _ = AF.step(params, g, st0, jnp.asarray(1), 0.01,
                       weight_decay=0.1,
                       decay_mask=OPT.decay_mask_2d(params), factored=fac)
    p_ref = jax.device_get(p_ref)

    mesh = PP.make_mesh_dp_pp(2, 2)
    pnp = {k: np.asarray(v) for k, v in params.items()}
    placed = PP.place_pp_params(pnp, cfg, mesh)
    st = PP.init_pp_af_state(placed, mesh, cfg, min_factor=MF)
    step_fn = PP.make_pp_train_step_adafactor(cfg, mesh, microbatches=2,
                                              min_factor=MF)
    from jax.sharding import PartitionSpec as P
    bs = jax.NamedSharding(mesh, P("data"))
    p1, st1, loss1 = step_fn(placed, st, jax.device_put(x, bs),
                             jax.device_put(y, bs),
                             jnp.asarray(1, jnp.int32),
                             jnp.asarray(0.01, jnp.float32),
                             jnp.asarray(0.1, jnp.float32))
    np.testing.assert_allclose(float(loss1), float(loss), rtol=1e-5)
    for k in p_ref:
        # same zero-grad K-bias noise-amplification rationale as the TP test
        np.testing.assert_allclose(
            np.asarray(jax.device_get(p1[k])), np.asarray(p_ref[k]),
            rtol=1e-4, atol=2e-4, err_msg=k)
    # block-leaf state shards over pipe
    assert "pipe" in str(st1.vf["fcb"].sharding.spec) or \
           "pipe" in str(st1.vr["fcw"].sharding.spec)


def test_3d_adafactor_parity_vs_single_device():
    """Adafactor on the dp x tp x pp mesh: leading-axis (pipe) invariance
    composed with the gathered-stats model-axis completion."""
    from vitrs_tpu.config import get_config
    from vitrs_tpu import params as PRM
    from vitrs_tpu.models import model as M
    from vitrs_tpu.ops import optimizer as OPT
    from vitrs_tpu.parallel import threed as D3
    from vitrs_tpu.parallel import tensor_parallel as TP
    cfg = get_config("gpt-nano", use_flash=False).replace(num_layers=4)
    params = PRM.init_params(cfg, jax.random.PRNGKey(4))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(0, cfg.vocab_size, (8, 16)))
    y = jnp.asarray(np.roll(np.asarray(x), -1, axis=1))
    MF = 2

    tpp = TP.to_tp_params(params, cfg)
    fac, _ = D3.threed_af_factored(cfg, min_factor=MF)
    st0 = AF.AdafactorState(
        *({k: jnp.zeros(p.shape[:-1] if fac[k] else (), jnp.float32)
           if f == "vr" else
           jnp.zeros(p.shape[:-2] + p.shape[-1:] if fac[k] else (),
                     jnp.float32)
           if f == "vc" else
           jnp.zeros(() if fac[k] else p.shape, jnp.float32)
           for k, p in tpp.items()} for f in ("vr", "vc", "vf")), {})
    loss, g = jax.value_and_grad(
        lambda p: M.gpt_loss(TP.from_tp_params(p, cfg), x, y, cfg))(tpp)
    p_ref, _ = AF.step(tpp, g, st0, jnp.asarray(1), 0.01,
                       weight_decay=0.1,
                       decay_mask=OPT.decay_mask_2d(tpp), factored=fac)
    p_ref = jax.device_get(p_ref)

    mesh = D3.make_mesh_3d(2, 2, 2)
    pnp = {k: np.asarray(v) for k, v in params.items()}
    placed = D3.place_params_3d(pnp, cfg, mesh)
    st = D3.init_af_state_3d(placed, mesh, cfg, min_factor=MF)
    step_fn = D3.make_3d_train_step_adafactor(cfg, mesh, microbatches=2,
                                              min_factor=MF)
    from jax.sharding import PartitionSpec as P
    bs = jax.NamedSharding(mesh, P("data"))
    p1, st1, loss1 = step_fn(placed, st, jax.device_put(x, bs),
                             jax.device_put(y, bs),
                             jnp.asarray(1, jnp.int32),
                             jnp.asarray(0.01, jnp.float32),
                             jnp.asarray(0.1, jnp.float32))
    np.testing.assert_allclose(float(loss1), float(loss), rtol=1e-5)
    for k in p_ref:
        np.testing.assert_allclose(
            np.asarray(jax.device_get(p1[k])), np.asarray(p_ref[k]),
            rtol=1e-4, atol=2e-4, err_msg=k)
