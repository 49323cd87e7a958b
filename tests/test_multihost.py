"""Multi-host execution without a cluster (SURVEY.md §4 item 4): two REAL
processes, localhost coordinator, 4 virtual CPU devices each → one global
8-device mesh; a DP train step must psum gradients ACROSS the process
boundary and leave every process with identical replicated results."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dp_step(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    outs = [os.path.join(str(tmp_path), f"r{i}.json") for i in range(2)]
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "mpnn_tpu.parallel.multihost",
             str(i), "2", coord, outs[i]],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append((p.returncode, out, err))
    assert all(rc == 0 for rc, _, _ in logs), logs
    results = [json.load(open(o)) for o in outs]
    assert results[0]["n_global_devices"] == 8
    assert results[1]["n_global_devices"] == 8
    # replicated outputs must agree bitwise across processes
    assert results[0]["loss"] == results[1]["loss"]
    assert results[0]["param_l1"] == results[1]["param_l1"]
    assert np.isfinite(results[0]["loss"])


def test_multihost_init_single_process_noop():
    from mpnn_tpu.parallel.multihost import multihost_init
    multihost_init(num_processes=1)          # must not touch jax.distributed
    multihost_init(num_processes=None)
