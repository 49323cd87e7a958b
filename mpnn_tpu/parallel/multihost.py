"""Multi-host (multi-process) execution over DCN — SURVEY.md §2.6(c).

The reference has zero distributed code; this is the greenfield JAX-native
recipe: `jax.distributed.initialize` brings every process into one runtime,
`jax.devices()` becomes the GLOBAL device list, a Mesh spans all hosts, and
per-process data becomes one global sharded array via
`jax.make_array_from_process_local_data` — after which the SAME jitted DP
train step used on one chip runs unchanged, with XLA routing gradient psums
over ICI within a host and DCN across hosts.

Tested WITHOUT a cluster (SURVEY.md §4 item 4): tests/test_multihost.py
spawns two local processes, each with 4 virtual CPU devices
(xla_force_host_platform_device_count), a localhost coordinator, and checks
the cross-process psum'd training step agrees with the single-process run.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np


def multihost_init(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   local_device_count: Optional[int] = None):
    """Bring this process into the global JAX runtime. No-op when
    single-process; parameters may also come from cluster env vars
    (jax.distributed auto-detection)."""
    import jax
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_global_batch(mesh, local_batch: dict, spec=None) -> dict:
    """Per-process local shards → global jax.Arrays on the mesh.

    Every array's leading axis is the data axis: local_batch holds this
    process's slice (global_size / num_processes rows). spec defaults to
    P('data')."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    spec = spec if spec is not None else P("data")
    sh = NamedSharding(mesh, spec)
    return {k: jax.make_array_from_process_local_data(sh, np.asarray(v))
            for k, v in local_batch.items()}


def run_worker_demo(process_id: int, num_processes: int,
                    coordinator: str, out_path: str,
                    local_devices: int = 4, steps: int = 3) -> dict:
    """A complete 2-host DP training demo on the dense flagship model:
    initialize the global runtime, build a global mesh over every host's
    devices, feed per-process batch halves, run `steps` train steps with
    cross-process gradient psum, and write {loss, param_norm} to out_path
    (every process must agree bit-for-bit on both)."""
    import os
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={local_devices}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    multihost_init(coordinator, num_processes, process_id)

    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mpnn_tpu import graphs as G
    from mpnn_tpu import models, parallel
    from mpnn_tpu.train.optim import adam

    n_global = len(jax.devices())
    assert n_global == num_processes * local_devices, jax.devices()
    mesh = Mesh(np.asarray(jax.devices()).reshape(n_global, 1),
                ("data", "edge"))

    # identical dataset on every process; each feeds its own half
    smiles = ["CCO", "c1ccccc1", "CC(=O)O", "CC(C)Cc1ccc(cc1)C(C)C(=O)O",
              "CN1C=NC2=C1C(=O)N(C(=O)N2C)C", "C1CCCCC1", "NC(=O)c1ccccc1",
              "OC(=O)c1ccccc1O"] * 2
    gs, ge = G.encode_molgraphs(G.generate_molgraphs(
        smiles, [0.1 * i for i in range(len(smiles))]))
    import dataclasses
    cfg = models.build("lipo", afm=ge.atom_width(), bfm=ge.bond_width(),
                       nafm=3, n_out=1)
    cfg = dataclasses.replace(cfg, mpnn=dataclasses.replace(
        cfg.mpnn, edge_mlp_tail_repeats=2, message_steps=2))

    batch = G.collate_dense(gs, num_nodes=32)
    per = len(gs) // num_processes
    lo, hi = process_id * per, (process_id + 1) * per
    local = {k: np.asarray(v)[lo:hi] for k, v in batch.items()}
    gbatch = make_global_batch(mesh, local)

    params, state = models.network_init(jax.random.PRNGKey(317), cfg)
    tx = adam(1e-3, weight_decay=1e-4)
    opt_state = tx.init(params)
    step = parallel.make_dp_train_step(cfg, tx, "mse", mesh)
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    state = jax.device_put(state, repl)
    opt_state = jax.device_put(opt_state, repl)

    loss = None
    for _ in range(steps):
        loss, params, state, opt_state = step(params, state, opt_state,
                                              gbatch)
    # fully-replicated outputs: every process reads identical values
    result = {
        "process_id": process_id,
        "n_global_devices": n_global,
        "loss": float(jax.device_get(loss)),
        "param_l1": float(sum(
            abs(np.asarray(jax.device_get(x))).sum()
            for x in jax.tree.leaves(params))),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    return result


if __name__ == "__main__":
    import sys
    run_worker_demo(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                    sys.argv[4])
