"""Forward-softmax residue isolation (round-5 verdict #1, ROPE_DIAG method).

Times the FWD-ONLY donated jit of GPT-2 124M under constant-substitution
variants of the multi-tile flash forward kernel (ops/flash_attention.py
FWD_DIAG — wrong math, identical shapes/memory traffic), attributing the
fwd's gap to the matmul ceiling per mechanism:

    baseline        production online softmax
    noexp           both exps -> linear       (exp transcendental cost)
    nomax           running-max machinery -> constants (max-reduce cost)
    skip            no tile compute at all    (whole-kernel upper bound)
    mxulsum         row-sum of p on the MXU   (candidate lever)

One variant per process (env read at import):
    for v in "" noexp nomax skip; do VITRS_FA_DIAG=$v python ...; done
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
from vitrs_tpu.models import model as M


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gpt2-124m")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    dev = jax.devices()[0]
    cfg = get_config(args.preset).replace(
        dtype="bfloat16" if dev.platform == "tpu" else "float32",
        use_flash=dev.platform == "tpu")
    B, T = args.batch, cfg.max_seq_len
    params = PRM.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, T + 1)))
    x, y = tokens[:, :-1], tokens[:, 1:]

    fwd = jax.jit(lambda p: M.loss_fn(p, x, y, cfg))
    r = fwd(params)
    float(r)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        r = fwd(params)
    float(r)
    dt = (time.perf_counter() - t0) / args.iters
    print({"variant": os.environ.get("VITRS_FA_DIAG", "") or
           ("mxulsum" if os.environ.get("VITRS_FA_FWD_MXU_LSUM") == "1"
            else "baseline"),
           "fwd_ms": round(dt * 1e3, 2), "B": B, "T": T})


if __name__ == "__main__":
    main()
