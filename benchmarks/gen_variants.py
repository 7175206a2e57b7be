"""Fixed-batch decode rates for the serving variant stack (verdict #7):
GQA kv=4 vs MHA at a LONG prompt (where the KV-cache read traffic should
matter), and streaming-window generation (ring cache, O(window) memory).

The relay's known per-dispatch floor (~5.2 ms/token single-stream) is why
rates are measured at batch: per-token wall divides over B rows.

Usage: python benchmarks/gen_variants.py [--mode gqa|mha|window]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vitrs_tpu import params as PRM
from vitrs_tpu.config import get_config
from vitrs_tpu.models import generate as G


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="gqa", choices=["gqa", "mha", "window"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--prompt", type=int, default=7680)
    ap.add_argument("--max-new", type=int, default=128)
    args = ap.parse_args()

    over = {"max_seq_len": 8192}
    if args.mode == "gqa":
        over["num_kv_heads"] = 4
    if args.mode == "window":
        over = {"max_seq_len": 8192, "window": 1024, "pos_emb": "rope"}
    cfg = get_config("gpt2-124m", dtype="bfloat16", use_flash=True, **over)
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                      (args.batch, args.prompt)))
    key = jax.random.PRNGKey(1)

    if args.mode == "window":
        out = G.generate_streaming(params, prompt, cfg, args.max_new, key,
                                   temperature=0.0)
        np.asarray(out[:, -1])             # sync (relay-safe)
        t0 = time.perf_counter()
        out = G.generate_streaming(params, prompt, cfg, args.max_new, key,
                                   temperature=0.0)
        np.asarray(out[:, -1])
        dt = time.perf_counter() - t0
    else:
        # DECODE-ONLY timing: the chunked prefill (untimed, one-time)
        # builds the cache; the timed program is one jitted greedy decode
        # scan — exactly the per-step KV-cache read traffic the GQA row is
        # meant to quantify.  (The dense cache-attention prefill is
        # O(S·Tmax) score memory per chunk — fine at the engine's 256-token
        # contexts, a known wall at 8K; the training-side flash kernels are
        # the long-context path.)
        B, T0 = prompt.shape
        Tmax = T0 + args.max_new
        caches = G.init_kv_cache(cfg, B, Tmax)
        CH = 512

        import functools

        # jit the chunk step (pos TRACED so one compile serves all
        # offsets; eager would be one relay RPC per op)
        @functools.partial(jax.jit, donate_argnums=(1,))
        def pre(chunk, caches, off):
            return G.forward_with_cache(params, chunk, caches, off, cfg)

        logits = None
        for off in range(0, T0, CH):
            logits, caches = pre(prompt[:, off:off + CH], caches,
                                 jnp.asarray(off, jnp.int32))
        first = jnp.argmax(logits[:, -1, :], axis=-1)

        @functools.partial(jax.jit, static_argnames=("n",))
        def decode_n(tok, caches, n):
            def step(carry, _):
                tok, pos, cc = carry
                lg, cc = G.forward_with_cache(params, tok[:, None], cc,
                                              pos, cfg)
                nxt = jnp.argmax(lg[:, -1, :], axis=-1)
                return (nxt, pos + 1, cc), nxt
            (last, _, _), toks = jax.lax.scan(
                step, (tok, jnp.asarray(T0, jnp.int32), caches), None,
                length=n)
            return toks

        toks_out = decode_n(first, caches, args.max_new)
        np.asarray(toks_out[-1])           # sync
        t0 = time.perf_counter()
        toks_out = decode_n(first, caches, args.max_new)
        np.asarray(toks_out[-1])
        dt = time.perf_counter() - t0

    toks = args.batch * args.max_new
    print({"mode": args.mode, "decode_tok_per_sec": round(toks / dt),
           "ms_per_step": round(1e3 * dt / args.max_new, 2),
           "B": args.batch, "prompt": args.prompt, "max_new": args.max_new,
           "kv_heads": over.get("num_kv_heads"),
           "window": over.get("window")})


if __name__ == "__main__":
    main()
