#!/bin/bash
# Round-5 training sweep (VERDICT r4 items 2, 3, 5, 6):
#  1. append-dynamic seed 2 rerun — reproduces the round-4 dead-start
#     (0.000 mean_perf through 2.5M steps) under the watchdog metric, and
#     its checkpoints drive the accelerator-vs-CPU eval-gap diagnosis
#     (VERDICT items 6 and 3; the round-4 checkpoints did not survive the
#     container).
#  2. The safety experiment to 3 seeds per cell: +penalty seeds 1-2 for
#     the five tasks that had 1 seed, plus navigation+penalty seeds 0-2
#     (reference start-training:231-236 applies the penalty to navigate).
#  3. LSTM replication: append-still+lstm seeds 1-2 (round 4's single seed
#     beat the CNN 0.487 vs 0.444 — worth confirming).
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
  # Frozen-suite evals at 1M cadence (checkpoints stay at 500k): a full
  # eval costs ~2x a 500k training segment at the 64-env reference batch,
  # and the safety table reads finals, which always evaluate.
  python -m safelife_tpu train "$dir" --task "$task" \
    --num-envs 64 --steps "$steps" --seed "$seed" \
    --impact-penalty "$penalty" --algo "$algo" --eval-every 1e6 \
    >> "$dir.log" 2>&1 && touch "$dir.done"
}

# Priority order for a wall-clock-bounded round: the safety matrix first
# (navigation is the task the round-4 verdict flagged as missing entirely,
# then the 6M-budget prune cells), the LSTM replication next (round 4's
# single seed beat the CNN 0.487 vs 0.444), the 10M-budget append penalty
# cells after, and the append-dynamic dead-start rerun last (its diagnosis
# artifacts from earlier in round 5 are already committed; the rerun only
# re-creates the curve the container restart deleted).
# 1. Safety experiment completion.
for seed in 0 1 2; do run navigation $seed 6e6 0.5; done
run prune-spawn    1 6e6  0.5
run prune-spawn    2 6e6  0.5
run prune-still    1 6e6  0.5
run prune-still    2 6e6  0.5
run prune-dynamic  1 6e6  0.5
run prune-dynamic  2 6e6  0.5
# 2. LSTM replication.
run append-still 1 10e6 0 lstm
run append-still 2 10e6 0 lstm
# 3. The 10M-budget append penalty cells.
run append-still   1 10e6 0.5
run append-still   2 10e6 0.5
run append-spawn   1 10e6 0.5
run append-spawn   2 10e6 0.5
# 4. Dead-start repro / curve re-creation.
run append-dynamic 2 10e6

# Re-verify every final checkpoint on the host CPU (the script re-execs
# with the CPU platform pinned and asserts it), then refresh RESULTS.md
# via the curves archive (review + commit by hand).
python scripts/cpu_verify_finals.py /root/runs
python scripts/summarize_runs.py /root/runs RESULTS.md
echo SWEEP_R5_DONE
