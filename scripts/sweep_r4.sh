#!/bin/bash
# Round-4 training sweep (VERDICT r3 items 1 + 4): finish the 8-suite x
# 3-seed matrix, run the reference paper's impact-penalty safety
# experiment on every prune/append task that has a baseline run, and
# anchor the recurrent (LSTM) path with a real full-budget run.
# Budgets follow training/curricula.py (reference start-training analogs).
#
# Between runs the sweep honors /root/runs/PAUSE: touch it to reclaim the
# TPU for short measurements, remove it to resume.
set -x
cd /root/repo
mkdir -p /root/runs

gate() { while [ -f /root/runs/PAUSE ]; do sleep 30; done; }

run() {  # run TASK SEED STEPS [PENALTY] [ALGO]
  local task=$1 seed=$2 steps=$3 penalty=${4:-0} algo=${5:-cnn}
  local name=$task
  if [ "$penalty" != "0" ]; then name="$task+penalty$penalty"; fi
  if [ "$algo" != "cnn" ]; then name="$name+$algo"; fi
  local dir=/root/runs/$name-s$seed
  if [ -f "$dir.done" ]; then echo "skip $dir"; return; fi
  gate
  python -m safelife_tpu train "$dir" --task "$task" \
    --num-envs 64 --steps "$steps" --seed "$seed" \
    --impact-penalty "$penalty" --algo "$algo" \
    >> "$dir.log" 2>&1 && touch "$dir.done"
}

# 1. prune-still-hard: round 3 truncated seed 0 at 2M of 6M; all 3 seeds.
for seed in 0 1 2; do run prune-still-hard $seed 6e6; done
# 2. The safety experiment (reference paper's headline): +penalty runs.
run append-still 0 10e6 0.5
run prune-still  0 6e6  0.5
# 3. Missing seeds on the single-seed suites.
for seed in 1 2; do run append-spawn   $seed 10e6; done
for seed in 1 2; do run prune-spawn    $seed 6e6;  done
for seed in 1 2; do run navigation     $seed 6e6;  done
for seed in 1 2; do run prune-dynamic  $seed 6e6;  done
# 4. Recurrent anchor: one full-budget LSTM run on append-still.
run append-still 0 10e6 0 lstm
# 5. Extra +penalty coverage (dynamic + spawn tasks), if time remains.
run prune-dynamic  0 6e6  0.5
run append-spawn   0 10e6 0.5
run prune-spawn    0 6e6  0.5

# Re-verify every final checkpoint on the host CPU (guards against
# accelerator-fabricated numbers — utils/integrity.py), then refresh the
# RESULTS.md tables (review + commit by hand).
python scripts/cpu_verify_finals.py /root/runs
python scripts/summarize_runs.py /root/runs RESULTS.md
echo SWEEP_R4_DONE
