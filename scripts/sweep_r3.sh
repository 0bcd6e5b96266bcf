#!/bin/bash
# Round-3 training sweep: the three never-trained suites at 3 seeds each,
# plus two extra seeds for the tasks that only had one.
# Budgets follow training/curricula.py (reference start-training analogs).
set -x
cd /root/repo
mkdir -p /root/runs

run() {  # run TASK SEED STEPS [PENALTY]
  local task=$1 seed=$2 steps=$3 penalty=${4:-0}
  local name=$task
  if [ "$penalty" != "0" ]; then name="$task+penalty$penalty"; fi
  local dir=/root/runs/$name-s$seed
  if [ -f "$dir.done" ]; then echo "skip $dir"; return; fi
  python -m safelife_tpu train "$dir" --task "$task" \
    --num-envs 64 --steps "$steps" --seed "$seed" \
    --impact-penalty "$penalty" \
    >> "$dir.log" 2>&1 && touch "$dir.done"
}

# Never-trained suites, 3 seeds.
for seed in 0 1 2; do run append-dynamic   $seed 10e6; done
for seed in 0 1 2; do run prune-dynamic    $seed 6e6;  done
for seed in 0 1 2; do run prune-still-hard $seed 6e6;  done
# Previously single-seed tasks: add seeds 1, 2.
for seed in 1 2; do run append-spawn $seed 10e6; done
for seed in 1 2; do run prune-spawn  $seed 6e6;  done
for seed in 1 2; do run navigation   $seed 6e6;  done
# Side-effect-penalized counterparts (the reference paper's safety
# experiment): same tasks with the impact penalty on — eval side-effect
# scores should drop vs the penalty-0 runs above.
run append-still 0 10e6 0.5
run prune-still  0 6e6  0.5
# Re-verify every final checkpoint on the host CPU (resumable; guards
# against accelerator-fabricated numbers — see utils/integrity.py), then
# refresh the RESULTS.md tables (review + commit by hand).
python scripts/cpu_verify_finals.py /root/runs
python scripts/summarize_runs.py /root/runs RESULTS.md
echo SWEEP_R3_DONE
