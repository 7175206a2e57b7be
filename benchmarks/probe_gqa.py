"""Fast GQA-kernel tuning probe: times JUST the fused qkv_attention op
(fwd + bwd) at a target GPT-2 shape, so kernel block/chunk variants get
~30 s TPU feedback instead of a full train-step compile.

Usage: python benchmarks/probe_gqa.py [--kv-heads 4] [--rope] [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu.ops.fused_qkv_attention import qkv_attention


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--channels", type=int, default=768)
    ap.add_argument("--kv-heads", type=int, default=4)
    ap.add_argument("--rope", action="store_true")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    B, T, H, C, KVH = (args.batch, args.seq, args.heads, args.channels,
                       args.kv_heads)
    D = C // H
    kvd = (KVH or H) * D
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    ln1 = jnp.asarray(rng.standard_normal((B, T, C)), dt)
    qkvw = jnp.asarray(rng.standard_normal((C + 2 * kvd, C)) * 0.02, dt)
    qkvb = jnp.zeros((C + 2 * kvd,), dt)

    kvh = KVH if KVH and KVH != H else 0

    def fwd(x, w, b):
        return jnp.sum(qkv_attention(x, w, b, H, True, False, 0,
                                     args.rope, kvh).astype(jnp.float32))

    f = jax.jit(fwd) if args.fwd_only else jax.jit(
        lambda x, w, b: jax.value_and_grad(fwd, argnums=(0, 1))(x, w, b)[0])
    t0 = time.time()
    out = f(ln1, qkvw, qkvb)
    float(out)
    print(f"compile+first: {time.time() - t0:.1f}s")
    for _ in range(3):
        out = f(ln1, qkvw, qkvb)
    float(out)
    t0 = time.time()
    for _ in range(args.iters):
        out = f(ln1, qkvw, qkvb)
    float(out)
    dt_ms = (time.time() - t0) / args.iters * 1e3
    tag = f"kv={KVH} rope={args.rope} fwd_only={args.fwd_only}"
    print(f"{tag}: {dt_ms:.3f} ms/call (B={B} T={T} H={H} C={C})")


if __name__ == "__main__":
    main()
