"""2-process CPU smoke test of the jax.distributed multi-host path.

Each subprocess initializes the distributed runtime with 2 virtual CPU
devices, so the global mesh spans 2 processes x 2 devices; the smoke
check all-gathers process ids across DCN-analog (grpc) and psums a
walker-sharded vector over the global mesh via shard_map.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import json, sys
coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
sys.path.insert(0, {repo!r})
from lumfuncmcmc_tpu.parallel.distributed import init_distributed, smoke_check
import jax
jax.config.update("jax_platforms", "cpu")
init_distributed(coord, nproc, pid, local_device_count=2)
print("SMOKE" + json.dumps(smoke_check()), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = _CHILD.format(repo=repo)
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children set their own device count

    procs = [subprocess.Popen(
        [sys.executable, "-c", child, coord, "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed smoke timed out")
        assert p.returncode == 0, err[-2000:]
        outs.append(out)

    for pid, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith("SMOKE")]
        assert line, out
        facts = json.loads(line[0][len("SMOKE"):])
        assert facts["process_index"] == pid
        assert facts["process_count"] == 2
        assert facts["device_count"] == 4
        assert facts["local_device_count"] == 2
        assert facts["gathered_pids"] == [0, 1]
        assert facts["psum_total"] == 4.0
