#!/bin/bash
# Round-4 training sweep, take 2 — rerun of every run from the first
# round-4 sweep, whose resets were corrupted by the default-precision MXU
# gather (fixed: env/state.py take_onehot pins Precision.HIGHEST; see the
# 2026-08-19 incident notes in utils/integrity.py).  Order: matrix gaps
# first (8 suites x 3 seeds), then the impact-penalty safety experiment,
# then the recurrent anchor, then extra penalty coverage.
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

# 1. Matrix gaps (8 suites x 3 seeds; seeds 0 of these and the full
#    append-still / append-dynamic / prune-still triples are valid
#    round-3 runs archived in results/curves.json).
for seed in 0 1 2; do run prune-still-hard $seed 6e6; done
for seed in 1 2; do run append-spawn   $seed 10e6; done
for seed in 1 2; do run prune-spawn    $seed 6e6;  done
for seed in 1 2; do run navigation     $seed 6e6;  done
for seed in 1 2; do run prune-dynamic  $seed 6e6;  done
# 2. The safety experiment (reference paper's headline): +penalty runs.
run append-still 0 10e6 0.5
run prune-still  0 6e6  0.5
# 3. Recurrent anchor: one full-budget LSTM run on append-still.
run append-still 0 10e6 0 lstm
# 4. Extra +penalty coverage (dynamic + spawn tasks), if time remains.
run prune-dynamic  0 6e6  0.5
run append-spawn   0 10e6 0.5
run prune-spawn    0 6e6  0.5

# Re-verify every final checkpoint on the host CPU (the script now
# re-execs with the CPU platform pinned and asserts it), then refresh
# RESULTS.md via the curves archive (review + commit by hand).
python scripts/cpu_verify_finals.py /root/runs
python scripts/summarize_runs.py /root/runs RESULTS.md
echo SWEEP_R4B_DONE
