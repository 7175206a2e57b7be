#!/bin/bash
# Full-suite runner in N process shards (default 4).
#
# Why shards: on some hosts XLA:CPU's JIT segfaults after several hundred
# compiles accumulate IN ONE PROCESS (observed on the round-4 host at
# ~62% of the monolithic run, 3/3 times, in backend_compile_and_load;
# every crashing test passes standalone).  Sharding bounds the
# per-process compile count; total work is unchanged.  A 2-shard run with
# the cache segfaulted on the round-5 host too — 4 is the floor.
#
# Why the cache: the persistent XLA compilation cache dedups identical
# compiles across shards AND across reruns.  Measured on the round-5 host:
# 4 shards 58 min cold-no-cache -> 28 min with a populated .pytest_jax_cache
# (508 tests green, no SIGILL/segfault).  On hosts whose AOT loader rejects
# its own entries (round-4 notes in tests/conftest.py), opt OUT with
# VITRS_NO_COMPILE_CACHE=1.
#
# Usage: bash tests/run_sharded.sh [N_SHARDS] [extra pytest args...]
set -u
N=${1:-4}; shift || true
cd "$(dirname "$0")/.."
if [ "${VITRS_NO_COMPILE_CACHE:-0}" != "1" ]; then
    export VITRS_JAX_COMPILE_CACHE=1
fi
fail=0
for i in $(seq 1 "$N"); do
    files=$(ls tests/test_*.py | awk -v n="$N" -v i="$i" 'NR % n == i - 1')
    echo "=== shard $i/$N ==="
    python -m pytest $files -q "$@" || fail=1
done
exit $fail
