#!/usr/bin/env python
"""Diagnose the accelerator-vs-CPU final-eval gap (round-4 verdict item 3).

Round 4 reported append-dynamic finals of 0.317 (accelerator, in-training
eval) vs 0.375 (CPU re-verification) — beyond noise, CPU higher on all
three seeds, under a blanket "CPU wins" policy.  This script replays ONE
checkpoint's frozen-suite eval under controlled conditions and separates
the candidate causes:

  1. **Eval sampling noise**: the eval rolls a SAMPLING policy once per
     level; K different eval keys on the same backend measure the
     Monte-Carlo spread a single eval carries.
  2. **Batch-shape RNG**: the TPU eval lane-pads 100 levels to 128, so
     ``jax.random.categorical`` draws different bits per level than the
     CPU's unpadded batch even with the same key — same-key runs with
     pad_to_lanes forced on/off isolate this (it is re-keyed noise, not
     bias).
  3. **Matmul precision**: the TPU policy forward runs its convs/dense
     layers at default precision (bf16 inputs on the MXU); the CPU runs
     f32.  A TPU eval under ``jax.default_matmul_precision('float32')``
     isolates whether the *policy itself* changes with precision.

Every eval is executed in a SUBPROCESS with the platform pinned through
the environment (the sitecustomize force-registers the TPU plugin before
main(), so in-process switching is unreliable — see
scripts/cpu_verify_finals.py).  Results go to
``results/eval_backend_diff.json`` and a summary table to stdout.

Usage: python scripts/eval_backend_diff.py <logdir> [--keys 3]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/safelife_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
cfg = json.loads(sys.argv[1])
if cfg["platform"] == "cpu":
    assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()
from safelife_tpu.benchmarking import run_benchmark
from safelife_tpu.training.driver import load_policy
policy, view = load_policy(cfg["logdir"])
import contextlib
ctx = (jax.default_matmul_precision("float32") if cfg["f32"]
       else contextlib.nullcontext())
with ctx:
    res = run_benchmark(cfg["suite"], policy, view_shape=view,
                        key=jax.random.PRNGKey(cfg["key"]),
                        pad_to_lanes=cfg["pad"])
out = dict(mean_perf=float(np.mean(res["performance"])),
           mean_length=float(np.mean(res["length"])),
           mean_reward=float(np.mean(res["reward"])),
           perf=[round(float(p), 4) for p in res["performance"]])
print("RESULT " + json.dumps(out))
"""


def run_eval(logdir, suite, platform, key, f32=False, pad=None):
    env = dict(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""
    cfg = dict(logdir=logdir, suite=suite, key=key, f32=f32,
               pad=pad, platform=platform)
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), json.dumps(cfg)],
        env=env, capture_output=True, text=True, timeout=3600)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"eval child failed ({platform}, key={key}, f32={f32}):\n"
        + proc.stdout[-2000:] + proc.stderr[-2000:])


def main():
    logdir = sys.argv[1]
    keys = int(sys.argv[2].split("=")[-1]) if len(sys.argv) > 2 else 3
    run = os.path.basename(logdir.rstrip("/"))
    suite = run.split("+")[0].rsplit("-s", 1)[0] \
        if "-s" in run else run.split("+")[0]
    # run names look like "<task>[+mods]-s<seed>"
    import re
    m = re.match(r"(.+?)(\+.*)?-s\d+$", run)
    if m:
        suite = m.group(1)
    print(f"run={run} suite={suite} keys={keys}", flush=True)

    rows = []
    for k in range(keys):
        rows.append(("tpu default", k,
                     run_eval(logdir, suite, "tpu", k)))
        print(f"  tpu key={k}: {rows[-1][2]['mean_perf']:.4f}", flush=True)
    for k in range(keys):
        rows.append(("cpu f32", k, run_eval(logdir, suite, "cpu", k)))
        print(f"  cpu key={k}: {rows[-1][2]['mean_perf']:.4f}", flush=True)
    # Precision probe: TPU with f32-pinned matmuls, same keys.
    for k in range(keys):
        rows.append(("tpu f32-matmul", k,
                     run_eval(logdir, suite, "tpu", k, f32=True)))
        print(f"  tpu-f32 key={k}: {rows[-1][2]['mean_perf']:.4f}",
              flush=True)
    # Batch-shape probe: TPU unpadded (falls off the fused path; same
    # XLA semantics, same batch shape as CPU -> same categorical draws).
    for k in range(keys):
        rows.append(("tpu unpadded", k,
                     run_eval(logdir, suite, "tpu", k, pad=False)))
        print(f"  tpu-unpad key={k}: {rows[-1][2]['mean_perf']:.4f}",
              flush=True)

    import numpy as np
    out = {"run": run, "suite": suite, "rows": [
        dict(config=c, key=k, **r) for c, k, r in rows]}
    by_cfg = {}
    for c, k, r in rows:
        by_cfg.setdefault(c, []).append(r["mean_perf"])
    print("\n| config | mean_perf over keys | spread (max-min) |")
    print("|---|---|---|")
    for c, v in by_cfg.items():
        print(f"| {c} | {np.mean(v):.4f} "
              f"({', '.join(f'{x:.4f}' for x in v)}) "
              f"| {max(v) - min(v):.4f} |")
    out["summary"] = {c: dict(mean=float(np.mean(v)),
                              spread=float(max(v) - min(v)))
                      for c, v in by_cfg.items()}
    path = os.path.join(REPO, "results", f"eval_backend_diff_{run}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
