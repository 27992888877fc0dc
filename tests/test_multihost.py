"""Two-process jax.distributed deployment of the distributed Schur solver.

The driver's virtual-device trick (xla_force_host_platform_device_count)
simulates chips but not processes; this test actually spawns 2 Python
processes, each owning 2 virtual CPU devices, wires them with
jax.distributed.initialize, and runs the shard_mapped in-program LM loop
over the 4-device cross-process mesh (SURVEY.md section 5.8 / step 6 of
the build plan; the reference's counterpart is the multiprocessing Pool of
ft_match.py:342-393)."""

import os
import re
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_solve():
    coord = "127.0.0.1:{}".format(_free_port())
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_NUM_CPU_DEVICES", None)
    # keep the axon TPU-tunnel PJRT plugin out of the workers entirely:
    # jax.distributed.initialize triggers discovery of every registered
    # plugin, and two processes dialing the single-tenant tunnel hang/crash
    for k in list(env):
        if "AXON" in k:
            env.pop(k)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "_multihost_worker.py"), str(i), "2", coord],
            env=env, cwd=HERE, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "process {} failed:\n{}".format(i, out[-4000:])

    # both controllers computed the identical replicated result
    results = []
    for out in outs:
        m = re.search(r"MULTIHOST_RESULT pid=\d+ nglobal=4 cost0=([\d.eE+-]+) "
                      r"cost=([\d.eE+-]+) iters=(\d+) err=([\d.eE+-]+)", out)
        assert m, out[-4000:]
        results.append(tuple(float(g) for g in m.groups()))
    assert results[0] == results[1], results
    cost0, cost, iters, err = results[0]
    assert cost < cost0
    assert iters >= 1
