"""Muon vs AdamW convergence head-to-head on the repo-corpus text task.

Trains the same 12M-parameter GPT (L6/C384/H6, T=256 — the
text_pretrain_demo model) twice from the same init with matched step
counts: once with tuned AdamW (the framework's production default), once
with hybrid Muon (ops/muon.py, the llm.c speedrun optimizer).  Reports
held-out val loss/ppl for both — the claim under test is Muon's
convergence-per-step advantage on transformer matrices.

Run:  python benchmarks/muon_vs_adamw.py --steps 1200
Emits one JSON line per optimizer plus a final comparison line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text_pretrain_demo import build_corpus  # noqa: E402  (benchmarks/)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--vocab", type=int, default=1024)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--adamw-lr", type=float, default=6e-4)
    ap.add_argument("--muon-lr", type=float, default=0.02)
    ap.add_argument("--muon-adamw-lr", type=float, default=6e-4,
                    help="AdamW lr for the non-matrix leaves in the hybrid")
    ap.add_argument("--warmup", type=int, default=100)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--channels", type=int, default=384)
    ap.add_argument("--heads", type=int, default=6)
    ap.add_argument("--workdir", default="/tmp/vitrs_muon_bench")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    from vitrs_tpu.data.tokenizer import ByteBPETokenizer
    from vitrs_tpu.models import model as M
    from vitrs_tpu.ops import muon
    from vitrs_tpu.ops import optimizer as opt

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(args.workdir, exist_ok=True)
    text = build_corpus(repo)
    tag = f"v{args.vocab}_c{len(text)}"
    tok_path = os.path.join(args.workdir, f"tok_{tag}.json")
    bin_path = os.path.join(args.workdir, f"ids_{tag}.bin")
    if os.path.exists(tok_path) and os.path.exists(bin_path):
        tok = ByteBPETokenizer.load(tok_path)
        ids = np.fromfile(bin_path, np.uint16)
    else:
        tok = ByteBPETokenizer.train(text, args.vocab)
        tok.save(tok_path)
        ids = np.asarray(tok.encode(text), np.uint16)
        ids.tofile(bin_path)
    print(f"corpus {len(text):,} chars -> {len(ids):,} tokens")

    cfg = get_config("gpt-nano", max_seq_len=args.seq,
                     vocab_size=tok.vocab_size, num_layers=args.layers,
                     channels=args.channels, num_heads=args.heads,
                     dtype="bfloat16", param_dtype="float32")

    T = args.seq
    n_win = len(ids) // (T + 1)
    n_val = max(16, args.batch)
    n_train = n_win - n_val
    wins = ids[: n_win * (T + 1)].reshape(n_win, T + 1)
    val = wins[n_train:]

    def batch(rng):
        rows = rng.integers(0, n_train, args.batch)
        w = wins[rows].astype(np.int32)
        return jnp.asarray(w[:, :-1]), jnp.asarray(w[:, 1:])

    @jax.jit
    def val_loss_fn(p):
        x = jnp.asarray(val[:, :-1].astype(np.int32))
        y = jnp.asarray(val[:, 1:].astype(np.int32))
        return M.gpt_loss(p, x, y, cfg)

    @jax.jit
    def adamw_step(p, m, v, s, x, y, lr):
        loss, g = jax.value_and_grad(M.gpt_loss)(p, x, y, cfg)
        p, m, v = opt.adamw_tree(p, g, m, v, s + 1, lr, weight_decay=0.1,
                                 decay_mask=opt.decay_mask_2d(p))
        return loss, p, m, v

    @jax.jit
    def muon_step(p, st, s, x, y, lr, alr):
        loss, g = jax.value_and_grad(M.gpt_loss)(p, x, y, cfg)
        p, st = muon.step(p, g, st, s + 1, lr, adamw_lr=alr,
                          weight_decay=0.0)
        return loss, p, st

    results = {}
    for name in ("adamw", "muon"):
        rng = np.random.default_rng(0)            # same batch order
        p = PRM.init_params(cfg, jax.random.PRNGKey(0))
        t0 = time.time()
        if name == "adamw":
            m = jax.tree_util.tree_map(jnp.zeros_like, p)
            v = jax.tree_util.tree_map(jnp.zeros_like, p)
            for s in range(args.steps):
                lr = opt.cosine_lr_host(s, args.adamw_lr, args.warmup,
                                        args.steps)
                x, y = batch(rng)
                loss, p, m, v = adamw_step(p, m, v, jnp.asarray(s), x, y,
                                           jnp.asarray(lr))
                if s % 200 == 0:
                    print(f"  {name} step {s}: loss {float(loss):.4f}")
        else:
            st = muon.init_state(p)
            for s in range(args.steps):
                fac = opt.cosine_lr_host(s, 1.0, args.warmup, args.steps)
                x, y = batch(rng)
                loss, p, st = muon_step(p, st, jnp.asarray(s), x, y,
                                        jnp.asarray(args.muon_lr * fac),
                                        jnp.asarray(args.muon_adamw_lr * fac))
                if s % 200 == 0:
                    print(f"  {name} step {s}: loss {float(loss):.4f}")
        vl = float(val_loss_fn(p))
        dt = time.time() - t0
        results[name] = vl
        print(json.dumps({"optimizer": name, "steps": args.steps,
                          "val_loss": round(vl, 4),
                          "val_ppl": round(float(np.exp(vl)), 2),
                          "wall_s": round(dt, 1)}))

    print(json.dumps({
        "metric": "muon_vs_adamw_val_loss_delta",
        "adamw": round(results["adamw"], 4),
        "muon": round(results["muon"], 4),
        "muon_advantage": round(results["adamw"] - results["muon"], 4)}))


if __name__ == "__main__":
    main()
