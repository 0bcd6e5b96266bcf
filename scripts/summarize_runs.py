#!/usr/bin/env python
"""Summarize training sweeps into RESULTS.md.

Parses the `eval @ N: ...` lines that Trainer.evaluate logs (frozen-suite
evaluation at every checkpoint) from a set of run logs, and writes
per-task eval curves + final-score tables.

Usage: python scripts/summarize_runs.py /root/runs [RESULTS.md]
"""

import os
import re
import sys
from collections import defaultdict

LINE = re.compile(
    r"eval @ (\d+): levels=(\d+) mean_perf=([\d.]+) median_perf=([\d.]+) "
    r"mean_reward=([\d.-]+) mean_length=([\d.]+)"
    r"(?: mean_side_effects=([\d.]+))?")


def parse_log(path):
    rows = []
    with open(path) as fh:
        for ln in fh:
            m = LINE.search(ln)
            if m:
                rows.append(dict(
                    step=int(m.group(1)),
                    mean_perf=float(m.group(3)),
                    median_perf=float(m.group(4)),
                    mean_reward=float(m.group(5)),
                    mean_length=float(m.group(6)),
                    side_effects=float(m.group(7)) if m.group(7) else None))
    return rows


def main(run_dir, out="RESULTS.md"):
    import glob

    import numpy as np

    runs = defaultdict(dict)   # task -> seed -> rows
    for log in sorted(glob.glob(os.path.join(run_dir, "*.log"))):
        name = os.path.basename(log)[:-4]
        m = re.match(r"(.+)-s(\d+)$", name)
        if not m:
            continue
        rows = parse_log(log)
        if rows:
            runs[m.group(1)][int(m.group(2))] = rows

    cpu_finals = {}
    cpu_path = os.path.join(run_dir, "cpu_finals.json")
    if os.path.exists(cpu_path):
        import json
        with open(cpu_path) as fh:
            cpu_finals = json.load(fh)

    lines = [
        "# Training results (anchored PPO curves)",
        "",
        "Frozen-suite evaluation during training: at every checkpoint the",
        "current policy runs over the task's 100-level benchmark suite",
        "(sampling policy, full episodes) and per-level EMD side-effect",
        "scores are computed on device.  Mean performance = completed /",
        "possible averaged over the suite; a random policy scores ~0.04.",
        "Config: reference hyperparameters + linear LR decay to 10%,",
        "endless procgen levels (bank regenerated every 250k steps),",
        "curriculum per `training/curricula.py`.",
        "",
        "Navigation levels carry no goal patterns (perf_possible = 0, so",
        "mean_perf reads 0 by construction); success there is reaching the",
        "exit: mean episode length and reward are the metrics (length",
        "1000 = never exits; the trained policy exits in ~200 steps with",
        "reward ~0.9 = 90% of episodes reach the exit).",
        "",
        "Prune-task performance counts red-cell removal only (losses of",
        "green life do not subtract — green scores 0 on empty goals), so",
        "an unpenalized policy can reach high prune-dynamic performance by",
        "destabilizing patterns indiscriminately; read those numbers",
        "together with the side-effects column, and compare the",
        "`+penalty` runs where the impact penalty is on.",
        "",
        "Integrity: final scores marked *CPU-verified* were re-computed by",
        "restoring the run's last checkpoint in a CPU process and replaying",
        "the frozen suite there (`scripts/cpu_verify_finals.py`).  This",
        "cross-check exists because on 2026-08-17 a degrading remote TPU",
        "returned all-zero goal scores at full speed, fabricating perfect",
        "prune-task results; those runs were quarantined and retrained, and",
        "the trainer now hard-aborts on such corruption",
        "(`safelife_tpu/utils/integrity.py`).  Accelerator-computed curve",
        "points from a degraded window can read low for append tasks (a",
        "zeroed score floors the eval at 0), so the CPU-verified final is",
        "authoritative where the two disagree.",
        "",
    ]
    for task in sorted(runs):
        seeds = runs[task]
        lines.append(f"## {task} ({len(seeds)} seeds)")
        lines.append("")
        metric = "mean_reward" if task == "navigation" else "mean_perf"
        lines.append("| step | " + " | ".join(
            f"seed {s} {metric}" for s in sorted(seeds)) +
            " | mean ± std | length | side effects |")
        lines.append("|---" * (len(seeds) + 4) + "|")
        steps = sorted({r["step"] for rows in seeds.values() for r in rows})
        for step in steps:
            perfs, effs, lens = [], [], []
            cells = []
            for s in sorted(seeds):
                row = next((r for r in seeds[s] if r["step"] == step), None)
                cells.append(f"{row[metric]:.3f}" if row else "—")
                if row:
                    perfs.append(row[metric])
                    lens.append(row["mean_length"])
                    if row["side_effects"] is not None:
                        effs.append(row["side_effects"])
            mean = np.mean(perfs)
            std = np.std(perfs)
            eff = f"{np.mean(effs):.1f}" if effs else "—"
            lines.append(
                f"| {step:,} | " + " | ".join(cells)
                + f" | {mean:.3f} ± {std:.3f} | {np.mean(lens):.0f} | {eff} |")
        finals = [rows[-1][metric] for rows in seeds.values()]
        lines.append("")
        lines.append(
            f"**Final {metric}: {np.mean(finals):.3f} ± "
            f"{np.std(finals):.3f}** "
            f"(seeds: {', '.join(f'{f:.3f}' for f in finals)})")
        cpu = [cpu_finals[f"{task}-s{s}"][metric]
               for s in sorted(seeds) if f"{task}-s{s}" in cpu_finals]
        if cpu:
            lines.append(
                f"**CPU-verified final {metric}: {np.mean(cpu):.3f} ± "
                f"{np.std(cpu):.3f}** "
                f"(seeds: {', '.join(f'{f:.3f}' for f in cpu)})")
        lines.append("")
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/runs",
         sys.argv[2] if len(sys.argv) > 2 else "RESULTS.md")
