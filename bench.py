"""Benchmark harness — ViT-B/16 training throughput on one TPU chip,
plus the GPT-2 124M row (the reference's own config) in `extra`.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
The primary metric stays the ViT-B row for history comparability across
rounds; extra.gpt2_124m carries tok/s + MFU of the full fused GPT train
step (B=32, T=1024, causal) so the driver's BENCH_r{N}.json records the
kernel stack's real state each round.

The reference publishes no numbers (BASELINE.md: 'None exist'), so
vs_baseline is reported against the BASELINE.json north-star target of 55%
MFU (vs_baseline = achieved_MFU / 0.55); >1.0 beats the target.
"""

import json
import sys
import time


def _relay_alive() -> bool:
    """The axon TPU is reached through a local relay (remote-compile HTTP
    service on 127.0.0.1:8083).  When the relay process is dead, jax backend
    init HANGS in make_c_api_client (observed >90 s, possibly forever) —
    probe the socket first so the bench fails fast to CPU instead."""
    import socket
    try:
        with socket.create_connection(("127.0.0.1", 8083), timeout=2):
            return True
    except OSError:
        return False


def main():
    import os
    import jax
    if (os.environ.get("JAX_PLATFORMS", "") == "axon"
            and not _relay_alive()):
        # backends init lazily: switching the config before the first
        # jax.devices() call avoids the hanging axon client entirely
        jax.config.update("jax_platforms", "cpu")
        print("bench: axon relay down (no listener on 127.0.0.1:8083) — "
              "falling back to CPU", file=sys.stderr)
    import jax.numpy as jnp
    import numpy as np

    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    from vitrs_tpu.models import model as M
    from vitrs_tpu.ops import optimizer as opt
    from vitrs_tpu.utils import flops as F

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    cfg = get_config("vit-b-16").replace(
        dtype="bfloat16" if on_tpu else "float32",
        use_flash=on_tpu)
    B = 64 if on_tpu else 4
    if not on_tpu:
        cfg = cfg.replace(num_layers=2, channels=128, num_heads=2)

    key = jax.random.PRNGKey(0)
    params = PRM.init_params(cfg, key)
    zeros = lambda: jax.tree_util.tree_map(
        lambda p: jnp.zeros(p.shape, jnp.float32), params)
    m, v = zeros(), zeros()
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal(
        (B, cfg.img_size, cfg.img_size, cfg.in_chans), dtype=np.float32))
    labels = jnp.asarray(rng.integers(0, cfg.num_classes, (B,)))

    def train_step(p, m, v, x, y, step, lr):
        loss, grads = jax.value_and_grad(M.loss_fn)(p, x, y, cfg)
        p, m, v = opt.adamw_tree(p, grads, m, v, step, lr, weight_decay=0.05)
        return p, m, v, loss

    step_fn = jax.jit(train_step, donate_argnums=(0, 1, 2))

    # warmup / compile; sync by *fetching the value* — on the axon relay,
    # block_until_ready returns before the remote computation finishes
    params, m, v, loss = step_fn(params, m, v, images, labels,
                                 jnp.asarray(1, jnp.int32),
                                 jnp.asarray(1e-3, jnp.float32))
    float(loss)

    iters = 20 if on_tpu else 3
    t0 = time.perf_counter()
    for i in range(2, iters + 2):
        params, m, v, loss = step_fn(params, m, v, images, labels,
                                     jnp.asarray(i, jnp.int32),
                                     jnp.asarray(1e-3, jnp.float32))
    loss_val = float(loss)
    dt = (time.perf_counter() - t0) / iters

    imgs_per_sec = B / dt
    mfu = F.mfu(imgs_per_sec, cfg, dev.device_kind, n_chips=1, train=True)

    # ---- GPT-2 124M row (the reference's own config) ------------------------
    gpt = {}
    try:
        gcfg = get_config("gpt2-124m").replace(
            dtype="bfloat16" if on_tpu else "float32", use_flash=on_tpu)
        GB, GT = (32, 1024) if on_tpu else (2, 64)
        if not on_tpu:
            gcfg = gcfg.replace(num_layers=2, channels=128, num_heads=2,
                                max_seq_len=GT)
        gp = PRM.init_params(gcfg, jax.random.PRNGKey(0))
        gm = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), gp)
        gv = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), gp)
        toks = jnp.asarray(rng.integers(0, gcfg.vocab_size, (GB, GT)))
        tgts = jnp.asarray(rng.integers(0, gcfg.vocab_size, (GB, GT)))

        def gpt_step(p, m, v, x, y, step, lr):
            loss, grads = jax.value_and_grad(M.loss_fn)(p, x, y, gcfg)
            p, m, v = opt.adamw_tree(p, grads, m, v, step, lr,
                                     weight_decay=0.1,
                                     decay_mask=opt.decay_mask_2d(p))
            return p, m, v, loss

        gstep = jax.jit(gpt_step, donate_argnums=(0, 1, 2))
        gp, gm, gv, gloss = gstep(gp, gm, gv, toks, tgts,
                                  jnp.asarray(1, jnp.int32),
                                  jnp.asarray(3e-4, jnp.float32))
        float(gloss)
        giters = 20 if on_tpu else 3
        t0 = time.perf_counter()
        for i in range(2, giters + 2):
            gp, gm, gv, gloss = gstep(gp, gm, gv, toks, tgts,
                                      jnp.asarray(i, jnp.int32),
                                      jnp.asarray(3e-4, jnp.float32))
        gloss_val = float(gloss)
        gdt = (time.perf_counter() - t0) / giters
        tok_s = GB * GT / gdt
        gflops = F.train_flops_per_example(gcfg) / gcfg.max_seq_len
        gmfu = tok_s * gflops / F.peak_flops(dev.device_kind, gcfg.dtype)
        gpt = {"tok_per_sec": round(tok_s, 0),
               "step_ms": round(gdt * 1e3, 2), "mfu": round(gmfu, 4),
               "batch": GB, "seq": GT,
               "loss_finite": bool(np.isfinite(gloss_val))}
    except Exception as e:     # the ViT metric must still be emitted
        gpt = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    # ---- MoE row (8-expert top-2 on the 124M geometry, Adafactor) ----------
    moe = {}
    try:
        # free the ViT and GPT rows' buffers first: B=24 is the MoE HBM
        # knee and ~2.5 GB of retained params/m/v from the earlier rows
        # pushes it to RESOURCE_EXHAUSTED
        del params, m, v, images, labels
        try:
            del gp, gm, gv, toks, tgts
        except NameError:
            pass
        mcfg = get_config("gpt2-moe-8e").replace(
            dtype="bfloat16" if on_tpu else "float32", use_flash=on_tpu,
            moe_cap_factor=1.0)
        MB, MT = (24, 1024) if on_tpu else (2, 64)
        if not on_tpu:
            mcfg = mcfg.replace(num_layers=2, channels=128, num_heads=2,
                                max_seq_len=MT, num_experts=4)
        from vitrs_tpu.ops import adafactor as AF
        mp = PRM.init_params(mcfg, jax.random.PRNGKey(0))
        mst = AF.init_state(mp)
        mx = jnp.asarray(rng.integers(0, mcfg.vocab_size, (MB, MT)))
        my = jnp.asarray(rng.integers(0, mcfg.vocab_size, (MB, MT)))

        def moe_step(p, st, step, lr):
            loss, grads = jax.value_and_grad(M.loss_fn)(p, mx, my, mcfg)
            p, st = AF.step(p, grads, st, step, lr)
            return p, st, loss

        mstep = jax.jit(moe_step, donate_argnums=(0, 1))
        mp, mst, mloss = mstep(mp, mst, jnp.asarray(1, jnp.int32),
                               jnp.asarray(1e-4, jnp.float32))
        float(mloss)
        miters = 10 if on_tpu else 3
        t0 = time.perf_counter()
        for i in range(2, miters + 2):
            mp, mst, mloss = mstep(mp, mst, jnp.asarray(i, jnp.int32),
                                   jnp.asarray(1e-4, jnp.float32))
        mloss_val = float(mloss)
        mdt = (time.perf_counter() - t0) / miters
        mtok_s = MB * MT / mdt
        mflops = F.train_flops_per_example(mcfg) / mcfg.max_seq_len
        moe = {"tok_per_sec": round(mtok_s, 0),
               "step_ms": round(mdt * 1e3, 2),
               "sparse_mfu": round(
                   mtok_s * mflops / F.peak_flops(dev.device_kind,
                                                  mcfg.dtype), 4),
               "batch": MB, "experts": mcfg.num_experts,
               "loss_finite": bool(np.isfinite(mloss_val))}
    except Exception as e:
        moe = {"error": f"{type(e).__name__}: {str(e)[:200]}"}

    print(json.dumps({
        "metric": "ViT-B/16 train images/sec/chip (bf16, fused AdamW)",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(mfu / 0.55, 4),
        "extra": {
            "step_time_ms": round(dt * 1e3, 2),
            "batch": B,
            "mfu": round(mfu, 4),
            "device": dev.device_kind,
            "loss_finite": bool(np.isfinite(loss_val)),
            "gpt2_124m": gpt,
            "gpt2_moe_8e": moe,
        },
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # still emit the one JSON line the driver records
        print(json.dumps({
            "metric": "ViT-B/16 train images/sec/chip (bf16, fused AdamW)",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {str(e)[:300]}",
        }))
        raise SystemExit(1)
