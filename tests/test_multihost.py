"""Multi-host training on a real 2-process JAX cluster (CPU backend).

The reference trains multi-node via accelerate/NCCL (SURVEY.md §2.7). Here
two OS processes, 4 virtual CPU devices each, form one 8-device JAX runtime
(jax.distributed); each runs the SAME Trainer.fit() with per-process data
shards (loader process_shard) assembled into global batches
(make_array_from_process_local_data) on a data=4 x model=2 mesh, and a
collective orbax checkpoint. Asserted: both processes see bit-identical
global losses, only process 0 writes logs, and the checkpoint restores.
"""

import json
import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from tests.test_trainer import TINY_DEGRADATION, _write_clip

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_cluster_fit(tmp_path):
    data = tmp_path / "data"
    (data / "videos").mkdir(parents=True)
    for i in range(4):
        _write_clip(data / "videos" / f"clip{i}.mp4")
    (data / "videos.txt").write_text(
        "".join(f"videos/clip{i}.mp4\n" for i in range(4))
    )
    (data / "degradation.yaml").write_text(TINY_DEGRADATION)
    out = tmp_path / "out"

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            DOVE_COORDINATOR=f"127.0.0.1:{port}",
            DOVE_NUM_PROCESSES="2",
            DOVE_PROCESS_ID=str(pid),
            # Each worker gets its OWN persistent compile cache. Sharing
            # conftest's cache dir is a trap: after any interrupted run,
            # one worker cache-hits (instant) while the other compiles
            # (>30 s on this 1-core host) — the fast worker then times out
            # Gloo's 30 s KV exchange at the first collective (measured,
            # deterministic). Per-worker dirs keep warmth SYMMETRIC.
            JAX_COMPILATION_CACHE_DIR=f"/tmp/dove_jax_test_cache_mh{pid}",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(REPO / "tests" / "multihost_worker.py"),
                 str(data), str(out)],
                env=env, cwd=REPO,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
        )
    outs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        outs.append(stdout)
    for pid, (p, stdout) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{stdout[-4000:]}"
        assert "WORKER DONE" in stdout

    # Global collective losses must be BIT-identical on every process.
    losses = []
    for stdout in outs:
        vals = re.findall(r"LOSS (\d+) ([0-9.]+)", stdout)
        assert len(vals) == 3, stdout[-2000:]
        losses.append([float(v) for _, v in vals])
    assert losses[0] == losses[1]
    assert all(np.isfinite(losses[0]))

    # Only process 0 writes host-side logs; the checkpoint is collective.
    log = (out / "train_log.jsonl").read_text().splitlines()
    assert len(log) == 3
    assert all(np.isfinite(json.loads(l)["loss"]) for l in log)
    assert (out / "checkpoint-3").exists()
