"""Two-process jax.distributed CPU test.

Launches tests/distributed_worker.py twice (rank 0/1, one CPU device
each) and asserts both complete: pickled all_gather, reduce_dict,
DistributedSampler shard coverage, 3 global-mesh train steps with
identical replicated params on both ranks, inference-style prediction
merge, and rank-0-only checkpointing. See the worker for the assertions.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.heavy


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(1500)
@pytest.mark.parametrize("world", [2, 4])
def test_multi_process_distributed(tmp_path, world):
    here = os.path.dirname(__file__)
    worker = os.path.join(here, "distributed_worker.py")
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # hermetic CPU subprocesses
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.join(here, ".."), here, env.get("PYTHONPATH", "")]
    )
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(rank), str(world), str(port),
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(world)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1440)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, "rank {} failed:\n{}".format(rank, out[-4000:])
        assert "WORKER_OK {}".format(rank) in out
