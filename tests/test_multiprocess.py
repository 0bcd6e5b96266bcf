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

    # ---- dp_efficiency_model wall-clock cross-check ---------------------
    # The scaling gate (tests/test_scaling.py) uses an additive model
    # T_total = T_compute + T_allreduce with HLO-derived inputs, because
    # virtual devices on this 1-core box cannot weak-scale by wall clock.
    # Here the collective TERM of that model — the part round 2 never
    # executed — is measured for real: the workers time the actual
    # gradient-sized psum crossing the process boundary over gloo, at two
    # message sizes (the model assumes allreduce time scales with bytes),
    # and a 1-process baseline supplies per-rank compute time.
    #
    # What this box CANNOT validate: the additive combination itself.
    # Two gloo ranks busy-poll on ONE physical core, so each rank's
    # collective wait burns the CPU the other rank needs — measured
    # 2-process step time lands several x above 2*t_1proc + t_allreduce.
    # That is oversubscription, not model error (on real hardware ranks
    # spin on their own cores); the gates below therefore bound sanity
    # directions and byte-scaling, and the full comparison is printed for
    # the record.
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
               SAFELIFE_SINGLE="1",
               PYTHONPATH=repo + os.pathsep + env.get("PYTHONPATH", ""))
    env.pop("SAFELIFE_COORDINATOR", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    p = subprocess.run([sys.executable, worker], env=env, cwd=repo,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True, timeout=_TIMEOUT)
    assert p.returncode == 0, f"baseline worker failed:\n{p.stdout[-4000:]}"
    line = [ln for ln in p.stdout.splitlines()
            if ln.startswith("RESULT ")][-1]
    base = json.loads(line[len("RESULT "):])

    t1 = base["train_batch_seconds"]
    t2 = max(r0["train_batch_seconds"], r1["train_batch_seconds"])
    t_ar = max(r0["allreduce_seconds"], r1["allreduce_seconds"])
    t_ar8 = max(r0["allreduce8_seconds"], r1["allreduce8_seconds"])
    n_bytes = 4 * base["n_params"]
    # Ring all-reduce moves 2*(n-1)/n*bytes = bytes at n=2, each way.
    bw = n_bytes / t_ar
    # The additive prediction (2x t_1proc: both ranks share one core;
    # 4x t_ar: one gradient psum per minibatch update + metric
    # reductions).  Informational — see the header comment.
    predicted = 2.0 * t1 + 4.0 * t_ar
    report = (f"t_1proc={t1 * 1e3:.1f}ms t_2proc={t2 * 1e3:.1f}ms "
              f"t_allreduce={t_ar * 1e3:.2f}ms (x8 bytes: "
              f"{t_ar8 * 1e3:.2f}ms) gloo_bw={bw / 1e6:.0f} MB/s "
              f"additive_prediction={predicted * 1e3:.1f}ms "
              f"({base['n_params']} params)")
    print("CROSSCHECK", report)
    # Byte-scaling of the collective term: 8x the message must cost
    # more, and no more than ~24x (the model's linear-in-bytes term
    # plus latency slack in both directions).
    assert t_ar < t_ar8 < 24.0 * t_ar, report
    # Sanity bounds: the prediction is a lower bound on this
    # oversubscribed box, and contention cannot be catastrophic.
    assert t2 > 0.8 * predicted, report
    assert t2 < 40.0 * t1, report
    # The measured collective term must be subdominant per batch, as the
    # scaling model claims for data-parallel training.
    assert 4.0 * t_ar < t2, report
