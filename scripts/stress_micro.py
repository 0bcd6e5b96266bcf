"""Decompose the stress (goal-spawner) bench: where do the ~0.96x cycles go?

Times, at the bench batch (65536) on the synthetic stress bank (spawners on
BOTH boards, so both CA advances run the full rule with live PRNG):

  a) full env step (the merged single-kernel variant lost on chip
     and was removed 2026-08-19);
  b) advance_both alone (full rule + 2 in-core spawn draws);
  c) advance_both with spawn masked off (spawnless rule pair) — isolates
     the PRNG + spawn-select cost;
  d) the same step on the append-dynamic bank (simple goals) for contrast.

Chained latencies (scan with state threading) — independent calls overlap
in the remote executor and report impossibly fast times.
"""
import time

import jax
import jax.numpy as jnp

from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.levels import loader, synth
from safelife_tpu.ops import life_pallas

B = 65536
STEPS = 64


def timeit(name, fn, *args):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{name:44s} FAILED: {str(e)[:90]}", flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best/STEPS*1e6:9.1f} us/step  "
          f"{B*STEPS/best/1e6:8.2f} M env-steps/s", flush=True)
    return out


def step_loop(env, bank):
    key = jax.random.PRNGKey(0)
    state = env.reset_all(bank, B, key)

    @jax.jit
    def run(state, key):
        def outer(carry, _):
            state, key = carry
            key, kf = jax.random.split(key)
            fresh = env.sample_fresh_levels(bank, B, kf)

            def body(carry, _):
                state, key = carry
                key, ka, ke = jax.random.split(key, 3)
                a = jax.random.randint(ka, (B,), 0, 9)
                state, ts = env.step(state, bank, a, ke, fresh_levels=fresh)
                return (state, key), \
                    ts.obs.astype(jnp.int32).sum() + ts.reward.sum()
            (state, key), r = jax.lax.scan(body, (state, key), length=16)
            return (state, key), r.sum()
        (state, key), r = jax.lax.scan(outer, (state, key),
                                       length=STEPS // 16)
        return state, r.sum()
    return run, state, key


def advance_loop(spawn_prob):
    @jax.jit
    def run(board, goals):
        def body(carry, i):
            b, g = carry
            b, g = life_pallas.advance_both(
                b, g, jnp.full((B,), spawn_prob, jnp.float32), seed=i)
            return (b, g), b[0, 0, 0].astype(jnp.int32)
        (b, g), r = jax.lax.scan(body, (board, goals),
                                 jnp.arange(STEPS, dtype=jnp.int32))
        return b, g, r.sum()
    return run


def main():
    stress = synth.synth_bank(64, h=26, w=26, spawners=True,
                              dynamic_goals=True)
    for name, cfg in [
        ("stress step default", EnvConfig(view_shape=(15, 15))),
    ]:
        env = BatchedSafeLifeEnv(cfg)
        run, state, key = step_loop(env, stress)
        timeit(name, run, state, key)

    lv = stress.take(jnp.arange(B) % stress.num_levels)
    board, goals = lv.board, lv.goals
    timeit("advance_both p=0.3 (2 spawn draws)", advance_loop(0.3),
           board, goals)
    timeit("advance_both p=0.0 (draws, never fire)", advance_loop(0.0),
           board, goals)

    for suite in ("append-dynamic", "append-still"):
        try:
            bank2 = loader.load_bank(f"benchmarks/v1.0/{suite}.npz")
        except Exception as e:
            print(f"{suite} bank unavailable: {e}")
            continue
        for label, cfg in [
            (f"{suite} step default", EnvConfig(view_shape=(15, 15))),
        ]:
            env = BatchedSafeLifeEnv(cfg)
            run, state, key = step_loop(env, bank2)
            timeit(label, run, state, key)


if __name__ == "__main__":
    main()
