#!/usr/bin/env python
"""Re-verify every sweep run's FINAL score on the host CPU.

The in-training eval numbers are computed on the accelerator; after the
2026-08-17 incident (a degrading remote TPU fabricated scores at full
speed — see safelife_tpu/utils/integrity.py) final scores are additionally
re-verified by restoring each run's last checkpoint in a CPU process and
replaying the frozen-suite benchmark there.  Results accumulate in
``<run_dir>/cpu_finals.json`` (resumable: runs already present are
skipped); ``scripts/summarize_runs.py`` merges them into RESULTS.md.

Usage: python scripts/cpu_verify_finals.py /root/runs
"""

import json
import os
import re
import sys

# Force the CPU backend.  Setting the env vars here is NOT enough on a
# box whose sitecustomize force-registers a TPU plugin at interpreter
# startup (before this file runs): the 2026-08-19 sweep's "CPU"
# verification silently ran on the degrading remote TPU that way and
# recorded its fabricated prune scores.  Re-exec with the vars pinned in
# the child's environment so they precede sitecustomize.
if os.environ.get("JAX_PLATFORMS") != "cpu" \
        or os.environ.get("PALLAS_AXON_POOL_IPS", None) != "":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.execv(sys.executable, [sys.executable] + sys.argv)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def assert_cpu():
    import jax
    devs = jax.devices()
    assert all(d.platform == "cpu" for d in devs), \
        f"verification must run on host CPU, got {devs}"


def main(run_dir):
    import glob

    out_path = os.path.join(run_dir, "cpu_finals.json")
    finals = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            finals = json.load(fh)

    import numpy as np  # noqa: F401  (jax deps after the env pins)
    from safelife_tpu.benchmarking import run_benchmark
    from safelife_tpu.training.driver import load_policy
    assert_cpu()

    for logdir in sorted(glob.glob(os.path.join(run_dir, "*-s[0-9]*"))):
        run = os.path.basename(logdir)
        m = re.match(r"(.+)-s(\d+)$", run)
        if not m or not os.path.isdir(os.path.join(logdir, "checkpoints")):
            continue
        if run in finals:
            continue
        if not os.path.exists(logdir + ".done"):
            # In-flight or interrupted run: its newest checkpoint is not a
            # final, and verifying it would record one as such (same gate
            # validate_sinkhorn.py --runs applies).
            print(f"{run}: SKIP (no .done marker — run not finished)")
            continue
        # "<task>+penalty<p>-sN" runs evaluate on the base task's suite.
        task = m.group(1).split("+")[0]
        try:
            policy, view = load_policy(logdir)
            res = run_benchmark(task, policy, view_shape=view)
        except Exception as e:  # missing ckpt / interrupted run
            print(f"{run}: SKIP ({type(e).__name__}: {e})")
            continue
        finals[run] = {
            "mean_perf": round(float(res["performance"].mean()), 4),
            "mean_reward": round(float(res["reward"].mean()), 3),
            "mean_length": round(float(res["length"].mean()), 1),
        }
        print(run, finals[run])
        with open(out_path, "w") as fh:
            json.dump(finals, fh, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/runs")
