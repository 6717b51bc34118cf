"""Cross-PROCESS map merge (SURVEY §5.8): two jax.distributed CPU processes,
each with its own robot + MultiMapper, must exchange map signatures over the
collective fabric, migrate the recognized map's payload, and merge it with
full Sim3 verification — the multi-host deployment of the reference's
shared-registry MultiMapper (MultiMapper.h:123-130)."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_cross_host_merge(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon plugin out
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # single CPU device per process
    procs = []
    for i in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "multihost_demo.py"),
             "--process-id", str(i), "--num-processes", "2",
             "--coordinator", f"localhost:{port}",
             "--out", str(tmp_path / f"mh{i}.json")],
            env=env, cwd=str(REPO),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=2100)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            pytest.fail(f"multihost worker timed out:\n{out[-3000:]}")
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = [json.load(open(tmp_path / f"mh{i}.json")) for i in range(2)]
    # at least one process imported the other's map and merged it
    assert any(r["imported"] > 0 for r in results), results
    merged = [r for r in results if r["merges"]]
    assert merged, f"no cross-process merge: {results}"
    for r in merged:
        # the merged map spans both halves and stays consistent with GT
        assert r["merged_n_kf"] >= 12, r
        if "merged_frames_ate" in r:
            assert r["merged_frames_ate"] < 0.6, r
