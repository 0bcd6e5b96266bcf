"""True multi-process runtime test: 2 CPU ranks over gloo.

Everything else in the suite fakes multi-device with a single-process
8-virtual-device mesh; this spawns two OS processes, runs
``jax.distributed.initialize`` through ``parallel.distributed.initialize``
(SAFELIFE_* env contract), builds the global mesh, and trains a few PPO
batches data-parallel across the process boundary — the code path a real
multi-host pod launch takes over DCN (SURVEY.md §4(d)).
"""
import json
import os
import socket
import subprocess
import sys

import pytest

_TIMEOUT = 900


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_gloo_training():
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multiprocess_worker.py")

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            PALLAS_AXON_POOL_IPS="",
            SAFELIFE_COORDINATOR=f"127.0.0.1:{port}",
            SAFELIFE_NUM_PROCS="2",
            SAFELIFE_PROC_ID=str(pid),
            PYTHONPATH=repo + os.pathsep + env.get("PYTHONPATH", ""),
        )
        # One device per rank: drop the 8-virtual-device flag the parent
        # test process sets for itself.
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f)
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=_TIMEOUT)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-4000:]}"
        r = json.loads(lines[-1][len("RESULT "):])
        results[r["pid"]] = r

    assert set(results) == {0, 1}
    r0, r1 = results[0], results[1]
    # Both ranks saw the same global step counter and identical replicated
    # parameters after data-parallel updates (the gradient all-reduce
    # crossed the process boundary).
    assert r0["steps"] == r1["steps"] >= 128
    assert r0["param_checksum"] == pytest.approx(
        r1["param_checksum"], rel=0, abs=0.0), \
        f"params diverged across ranks: {r0} vs {r1}"
    assert r0["param_checksum"] > 0
