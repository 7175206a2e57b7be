#!/bin/bash
# One-shot capture of every TPU datapoint pending from the round-3 feature
# work (the axon grant was wedged for the whole feature session).  Each step
# appends raw output to $OUT; steps are ordered cheapest-compile first so a
# re-wedge mid-run still yields the front of the list.
#
# Usage:  bash benchmarks/tpu_datapoints.sh [outfile]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_datapoints.log}"
echo "== tpu_datapoints $(date -u +%FT%TZ) ==" | tee -a "$OUT"

run() {
  echo "--- $* ---" | tee -a "$OUT"
  timeout 1800 "$@" 2>&1 | tail -20 | tee -a "$OUT"
}

# 0. probe (fail fast if still wedged)
run python -c "import jax, jax.numpy as jnp; x = jnp.ones((256,256), jnp.bfloat16); print('TPU alive:', float((x@x).sum()))" || exit 1

# 1. headline regression guard: the driver benchmark
run python bench.py

# 2. GPT-2 124M headline (unchanged path — regression check after the
#    decode/attention refactors)
run python benchmarks/gpt2_train.py --batch 32 --iters 20

# 3. windowed long context: T=8192 with window 1024 vs the 54.6k full run
run python benchmarks/gpt2_train.py --batch 2 --iters 10 --seq 8192 --window 1024
run python benchmarks/gpt2_train.py --batch 4 --iters 10 --seq 4096 --window 1024

# 4. MQA + rope variant throughput at the reference config
run python benchmarks/gpt2_train.py --batch 32 --iters 20 --kv-heads 4 --pos-emb rope

# 5. serving: engine aggregate (regression after the grouped-attention
#    decode refactor) + GQA cache effect needs a trained GQA model, so the
#    MHA engine numbers are the comparable row
run python benchmarks/serving_engine.py

# 6. speculative decoding on the repo-corpus-trained target/draft pair
run python benchmarks/speculative_demo.py --steps 1200

# 7. Muon vs AdamW at the 12M text-demo scale (the CPU run was 4.3M)
run python benchmarks/muon_vs_adamw.py --steps 800

echo "== done $(date -u +%FT%TZ) ==" | tee -a "$OUT"
