"""Subprocess worker for tests/test_multihost.py — one JAX process of a
2-process CPU cluster (SURVEY.md §5.8: 'multi-host via jax.distributed over
DCN; nothing else changes').

Each process owns 2 virtual CPU devices; the global mesh spans 4.  The
worker runs two global DP train steps on gpt-nano, cooperatively writes a
range-sharded checkpoint (each process serializes its half of the payload
into ONE file), and prints a JSON result line for the parent test.

Usage: _multihost_worker.py <process_id> <num_processes> <coordinator> <dir>
"""

import json
import os
import sys

# the worker runs as a plain script (sys.path[0] = tests/), so the repo
# root must be added explicitly — an editable install is NOT assumed
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coordinator, outdir = sys.argv[3], sys.argv[4]

    from vitrs_tpu.parallel import multihost
    multihost.initialize(coordinator_address=coordinator,
                         num_processes=nproc, process_id=pid,
                         initialization_timeout=60)
    info = multihost.host_info()
    assert info["num_processes"] == nproc, info
    assert info["local_devices"] == 2, info
    assert info["global_devices"] == 2 * nproc, info
    assert multihost.is_primary() == (pid == 0)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vitrs_tpu import params as PRM
    from vitrs_tpu.config import get_config
    from vitrs_tpu.parallel import data_parallel as DP

    cfg = get_config("gpt-nano", use_flash=False)
    mesh = Mesh(np.asarray(jax.devices()), ("data",))     # global 4-device

    # deterministic global batch; this process feeds its device rows
    B_global, T = 8, cfg.max_seq_len
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.vocab_size, (B_global, T + 1), dtype=np.int64)
    x_np, y_np = toks[:, :-1], toks[:, 1:]
    batch_sh = NamedSharding(mesh, P("data"))
    rows = B_global // nproc
    x = jax.make_array_from_process_local_data(
        batch_sh, x_np[pid * rows:(pid + 1) * rows], x_np.shape)
    y = jax.make_array_from_process_local_data(
        batch_sh, y_np[pid * rows:(pid + 1) * rows], y_np.shape)

    params_host = PRM.init_params(cfg, jax.random.PRNGKey(0))
    repl = NamedSharding(mesh, P())
    params = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(
            repl, np.asarray(a), a.shape), params_host)
    m, v = DP.init_sharded_opt_state(cfg, mesh)

    step_fn = DP.make_dp_train_step(cfg, mesh)
    losses = []
    for i in range(1, 3):
        params, m, v, loss = step_fn(
            params, m, v, x, y, jnp.asarray(i, jnp.int32),
            jnp.asarray(1e-3, jnp.float32), jnp.asarray(0.0, jnp.float32))
        losses.append(float(loss))

    # cooperative range-sharded checkpoint: both processes write their half
    # of [params | m | v] into the SAME file (checkpoint_async.py)
    from vitrs_tpu import checkpoint_async as CA
    gather = jax.jit(lambda t: t, out_shardings=repl)
    n = PRM.num_parameters(cfg)
    m_full = np.asarray(gather(m))[:n]
    v_full = np.asarray(gather(v))[:n]
    params_np = {k: np.asarray(gather(p)) for k, p in params.items()}
    path = os.path.join(outdir, "multihost.ckpt")
    CA.save_checkpoint_sharded(path, cfg, host_id=pid, num_hosts=nproc,
                               params=params_np, m=m_full, v=v_full,
                               step=2, seed=0, cursor=16)
    # save_checkpoint_sharded barriers internally: returning means the file
    # is complete for every process
    print(json.dumps({"pid": pid, "losses": losses,
                      "num_processes": info["num_processes"],
                      "global_devices": info["global_devices"]}))


if __name__ == "__main__":
    main()
