"""Headline benchmark: lockstep SafeLife env-steps/s on one chip.

Measures the FULL environment step — agent action, two CA advances
(board + goals), reward/scoring, exit recoloring, auto-reset from the level
bank, and observation extraction — for B lockstep environments under one
jitted scan, on real benchmark levels (append-still, 26x26).

Before timing, a hardware SELFTEST certifies the fused Pallas fast path on
this chip: fused env.step must reproduce the XLA path (itself golden-tested
against the reference C engine) bit-for-bit over a multi-episode rollout,
and the in-core PRNG spawn sampling must be seed-deterministic with the
right spawn rate.  A failed selftest aborts the bench (nonzero exit), so
every recorded BENCH_r*.json also certifies correctness of the kernels
that produced it.

Prints ONE JSON line:
    {"metric": "env_steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N / 10e6}
plus '#'-comment lines on stderr: the dynamic-goals variant (goal board is
NOT a CA fixed point, so both CA advances run — the *-spawn-like worst
case) and device/config details.

Baseline = the north-star target from BASELINE.md (10M env-steps/s per
host); the reference implementation itself steps a single board per Python
call through its C extension at ~1e5 steps/s/core.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import safelife_tpu.cells as C
from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.levels import loader, synth
from safelife_tpu.ops import life_pallas

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SAFELIFE_JAX_CACHE",
                                 "/tmp/safelife_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_STEPS_PER_S = 10e6  # north-star from BASELINE.md

# 65536 envs saturate the chip (8.2M steps/s at 16k -> 9.2M at 64k;
# flat beyond); state + obs fit comfortably in 16 GB HBM.
BATCH = int(os.environ.get("BENCH_BATCH", 65536))
STEPS = int(os.environ.get("BENCH_STEPS", 160))
REPEATS = int(os.environ.get("BENCH_REPEATS", 5))
ROLLOUT = 20  # fresh-level cadence == PPO steps_per_env


def wait_for_device(deadline_s=float(os.environ.get("BENCH_PROBE_DEADLINE",
                                                    1200))):
    """Probe the accelerator in a SUBPROCESS until it answers a matmul.

    The TPU here is remote (axon PJRT tunnel); when the pool is wedged the
    first compute hangs indefinitely while ``jax.devices()`` still lists
    the chip.  Probing in a child process (killed on timeout) keeps this
    process clean, and a bounded retry window lets the bench survive a
    pool flap instead of recording a hang.  Returns True when a probe
    succeeds; False when the deadline expires (the bench then proceeds —
    on a CPU-only box the probe succeeds immediately anyway).
    """
    import subprocess
    probe = ("import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128), jnp.bfloat16); "
             "print(float((x @ x).sum()))")
    t0 = time.monotonic()
    while True:
        try:
            subprocess.run([sys.executable, "-c", probe], timeout=180,
                           check=True, capture_output=True)
            return True
        except Exception as e:
            waited = time.monotonic() - t0
            if waited >= deadline_s:
                # A wedged remote TPU hangs the first compute FOREVER while
                # jax.devices() still lists the chip — exiting cleanly here
                # beats hanging whatever drives the bench.  (On a CPU-only
                # box the probe succeeds immediately and we never get here.)
                print(f"# device probe still failing after {waited:.0f}s "
                      f"({type(e).__name__}); accelerator pool is down — "
                      f"refusing to hang on the first compute",
                      file=sys.stderr)
                sys.exit(2)
            print(f"# device probe failed ({type(e).__name__}); "
                  f"retrying ({waited:.0f}s/{deadline_s:.0f}s)",
                  file=sys.stderr)
            time.sleep(60)


def load_benchmark_bank():
    try:
        return loader.load_bank("benchmarks/v1.0/append-still.npz")
    except Exception:
        return synth.synth_bank(64, h=26, w=26, spawners=True)


# --------------------------------------------------------------------------
# Hardware selftest of the fused fast path.
# --------------------------------------------------------------------------

def _rollout_trace(env, bank, actions, b):
    key = jax.random.key(123)
    state = env.reset_to_levels(bank, jnp.arange(b) % bank.num_levels)
    fresh = env.sample_fresh_levels(bank, b, jax.random.key(7))
    trace = []
    for t in range(actions.shape[0]):
        state, ts = env.step(state, bank, jnp.asarray(actions[t]), key,
                             fresh_levels=fresh)
        trace.append(jax.device_get(dict(
            board=state.board, goals=state.goals, reward=ts.reward,
            done=ts.done, agent_row=state.agent_row,
            agent_col=state.agent_col, points=state.points_last,
            comp=ts.perf_completed, poss=ts.perf_possible, obs=ts.obs)))
    return trace


def selftest(bank):
    """Fused-vs-XLA bit-equality + PRNG sanity on the real device."""
    if not life_pallas.available():
        print("# selftest skipped: no TPU backend", file=sys.stderr)
        return
    b = 256
    # 1. Multi-episode rollout equivalence on spawner-free levels (the
    #    spawn draw is masked out, so both paths are deterministic) —
    #    both the auto-reset fold kernel (training) and the no-reset
    #    kernel (lane-padded benchmark evals).
    assert not (np.asarray(bank.board) & C.SPAWNING).any()
    actions = np.random.RandomState(9).randint(0, 9, (12, b))
    # Second fixture: GOAL boards with spawners at spawn_prob=0 — takes
    # the two-stencil spawn-simple pair path (the stress-bench kernel)
    # deterministically, so it bit-compares against XLA too.
    gs_bank = synth.synth_bank(8, h=26, w=26, spawners=False,
                               dynamic_goals=True)
    assert gs_bank.spawn_simple_goals and not gs_bank.simple_goals
    assert float(np.asarray(gs_bank.spawn_prob).max()) == 0.0
    for test_bank in (bank, gs_bank):
        for cfg in (dict(time_limit=6, auto_reset=True),
                    dict(time_limit=20, auto_reset=False)):
            tr_fused = _rollout_trace(
                BatchedSafeLifeEnv(EnvConfig(**cfg)), test_bank, actions, b)
            tr_xla = _rollout_trace(
                BatchedSafeLifeEnv(EnvConfig(use_pallas=False, **cfg)),
                test_bank, actions, b)
            for t, (a, x) in enumerate(zip(tr_fused, tr_xla)):
                for k in a:
                    np.testing.assert_array_equal(
                        a[k], x[k],
                        err_msg=f"fused!=xla at step {t}, field {k}, "
                                f"cfg {cfg}")

    # 2. In-core PRNG: seed-deterministic, seed-sensitive, correct rate.
    h = w = 8
    board = np.zeros((h, w, b), np.uint16)
    board[3, 3, :] = C.SPAWNER
    goals = jnp.zeros((h, w, b), jnp.uint16)
    p = 0.3
    probs = jnp.full(b, p, jnp.float32)
    outs = {}
    spawned = total = 0
    for seed in (0, 1, 2, 3, 4, 0):
        out, _ = life_pallas.advance_both(jnp.asarray(board), goals, probs,
                                          seed=seed)
        outs.setdefault(seed, []).append(np.asarray(out))
    np.testing.assert_array_equal(outs[0][0], outs[0][1],
                                  err_msg="same seed must reproduce")
    assert not np.array_equal(outs[0][0], outs[1][0]), "seeds must differ"
    for seed, (out, *_) in outs.items():
        neigh = out[2:5, 2:5, :]
        born = (neigh & 1).astype(bool)  # spawner itself is dead+frozen
        assert not born[1, 1].any()
        spawned += int(born.sum())
        total += 8 * b
        assert (neigh[born] == (C.ALIVE | C.DESTRUCTIBLE)).all()
    rate = spawned / total
    sigma = (p * (1 - p) / total) ** 0.5
    assert abs(rate - p) < 5 * sigma, f"spawn rate {rate:.4f} vs p={p}"
    print(f"# selftest OK: fused==xla over {len(actions)} steps x {b} envs; "
          f"spawn rate {rate:.4f} (p={p})", file=sys.stderr)


# --------------------------------------------------------------------------
# Timing.
# --------------------------------------------------------------------------

def time_env(bank, batch, steps):
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(15, 15)))
    key = jax.random.PRNGKey(0)
    k_reset, k_run = jax.random.split(key)
    state = env.reset_all(bank, batch, k_reset)

    @jax.jit
    def run(state, key):
        def outer(carry, _):
            state, key = carry
            key, k_fresh = jax.random.split(key)
            fresh = env.sample_fresh_levels(bank, batch, k_fresh)

            def body(carry, _):
                state, key = carry
                key, k_act, k_env = jax.random.split(key, 3)
                action = jax.random.randint(k_act, (batch,), 0, 9)
                state, ts = env.step(state, bank, action, k_env,
                                     fresh_levels=fresh)
                # Consume the OBSERVATION, not just the reward: otherwise
                # XLA dead-code-eliminates the whole obs extraction and
                # the headline overstates by ~40% (a real actor feeds the
                # obs to its policy every step).
                out = ts.obs.astype(jnp.int32).sum() + ts.reward.sum()
                return (state, key), out
            (state, key), rewards = jax.lax.scan(
                body, (state, key), length=ROLLOUT)
            return (state, key), rewards.sum()
        (state, key), rewards = jax.lax.scan(
            outer, (state, key), length=steps // ROLLOUT)
        return state, key, rewards.sum()

    state, k_run, _ = jax.block_until_ready(run(state, k_run))  # compile
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        state, k_run, r = run(state, k_run)
        jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    return batch * (steps // ROLLOUT) * ROLLOUT / best, state


def main():
    wait_for_device()
    bank = load_benchmark_bank()
    if os.environ.get("BENCH_SELFTEST", "1") != "0":
        # Host-golden integrity first (catches a chip that computes wrong
        # values at full speed), then the fused-vs-XLA rollout selftest.
        from safelife_tpu.utils.integrity import check_device_integrity
        check_device_integrity()
        selftest(bank)

    steps_per_s, state = time_env(bank, BATCH, STEPS)
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(steps_per_s),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / BASELINE_STEPS_PER_S, 4),
    }))
    print(f"# device={jax.devices()[0].device_kind} batch={BATCH} "
          f"steps={STEPS} global_steps={int(state.num_steps)}",
          file=sys.stderr)

    # Dynamic-goals variant: the real append-dynamic benchmark suite —
    # the goal board is not a CA fixed point, so the fused kernel
    # advances both boards every step (the *-dynamic training regime).
    try:
        dyn_bank = loader.load_bank("benchmarks/v1.0/append-dynamic.npz")
        assert not dyn_bank.static_goals
        dyn_steps_per_s, _ = time_env(dyn_bank, BATCH, STEPS)
        print(f"# dynamic_goals_env_steps_per_sec={round(dyn_steps_per_s)} "
              f"({dyn_steps_per_s / BASELINE_STEPS_PER_S:.4f}x baseline) "
              f"[append-dynamic suite]", file=sys.stderr)
    except Exception as e:
        print(f"# dynamic suite unavailable: {e}", file=sys.stderr)

    # Synthetic stress case beyond any real suite: spawners on BOTH the
    # board and the goal board (no shipped suite puts spawners in goals),
    # so both CA advances run the full rule with live PRNG sampling.
    stress_bank = synth.synth_bank(64, h=26, w=26, spawners=True,
                                   dynamic_goals=True)
    assert not stress_bank.static_goals and not stress_bank.simple_goals
    stress_steps_per_s, _ = time_env(stress_bank, BATCH, STEPS)
    print(f"# stress_goalspawner_env_steps_per_sec="
          f"{round(stress_steps_per_s)} "
          f"({stress_steps_per_s / BASELINE_STEPS_PER_S:.4f}x baseline)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
