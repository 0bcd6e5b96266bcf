"""Micro-benchmarks for the env step components (run on TPU)."""
import time

import jax
import jax.numpy as jnp

from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.levels import loader, synth
from safelife_tpu.ops import life, obs as obs_ops

B = 4096
STEPS = 64


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per_step = best / STEPS
    print(f"{name:34s} {best*1e3:9.2f} ms total  "
          f"{per_step*1e6:9.1f} us/step  "
          f"{B*STEPS/best/1e6:8.2f} M env-steps/s")
    return out


def scan_loop(body, init):
    @jax.jit
    def run(init):
        return jax.lax.scan(body, init, length=STEPS)[0]
    return run


def main():
    try:
        bank = loader.load_bank("benchmarks/v1.0/append-still.npz")
    except Exception:
        bank = synth.synth_bank(64, h=26, w=26, spawners=True)
    key = jax.random.PRNGKey(0)

    # (a) raw CA advance, pre-drawn spawn field
    board = bank.take(jnp.arange(B) % bank.num_levels).board
    spawn = jnp.zeros(board.shape, bool)

    def ca_body(b, _):
        return life.advance_board(b, spawn), None
    timeit("CA advance (fixed spawn field)", scan_loop(ca_body, board), board)

    # (b) CA advance + on-device RNG spawn field
    def ca_rng_body(carry, _):
        b, k = carry
        k, k2 = jax.random.split(k)
        u = jax.random.uniform(k2, b.shape, jnp.float32)
        return (life.advance_board(b, u < 0.3), k), None
    timeit("CA advance + uniform field",
           scan_loop(ca_rng_body, (board, key)), (board, key))

    # (c) env step without obs / without auto_reset
    for label, cfg in [
        ("env step (no obs, no reset)",
         EnvConfig(compute_obs=False, auto_reset=False)),
        ("env step (no obs, auto reset)",
         EnvConfig(compute_obs=False, auto_reset=True)),
        ("env step (obs 15x15, auto reset)",
         EnvConfig(view_shape=(15, 15), auto_reset=True)),
    ]:
        env = BatchedSafeLifeEnv(cfg)
        st = env.reset_all(bank, B, key)

        def body(carry, _):
            st, k = carry
            k, ka, ke = jax.random.split(k, 3)
            a = jax.random.randint(ka, (B,), 0, 9)
            st, ts = env.step(st, bank, a, ke)
            return (st, k), None
        timeit(label, scan_loop(body, (st, key)), (st, key))




def op_bench():
    from safelife_tpu.ops import agent as agent_ops, scoring
    from safelife_tpu.env.state import find_exits
    try:
        bank = loader.load_bank("benchmarks/v1.0/append-still.npz")
    except Exception:
        bank = synth.synth_bank(64, h=26, w=26, spawners=True)
    key = jax.random.PRNGKey(0)
    lv = bank.take(jnp.arange(B) % bank.num_levels)
    board, goals = lv.board, lv.goals
    ar, ac = lv.agent_row.astype(jnp.int32), lv.agent_col.astype(jnp.int32)
    orient = lv.orientation.astype(jnp.int32)
    action = jax.random.randint(key, (B,), 0, 9)
    can_exit = jnp.ones(B, bool)
    over = jnp.zeros(B, bool)

    def mk(body):
        @jax.jit
        def run(x):
            return jax.lax.scan(body, x, length=STEPS)[0]
        return run

    timeit("current_points", mk(lambda b, _:
        (b + scoring.current_points(b, goals).astype(jnp.uint16)[None, None, :], None)), board)
    timeit("performance_score", mk(lambda b, _:
        (b + scoring.performance_score(b, goals).astype(jnp.uint16)[None, None, :], None)), board)
    timeit("execute_action", mk(lambda b, _:
        (agent_ops.execute_action(b, ar, ac, orient, action, can_exit, over).board, None)), board)
    timeit("find_exits", mk(lambda b, _:
        (b + find_exits(b, 4)[0].sum().astype(jnp.uint16), None)), board)
    timeit("bank.take", mk(lambda i, _:
        ((i + bank.take(i).board.sum(axis=(0,1)).astype(jnp.int32)) % 100, None)),
        jnp.arange(B, dtype=jnp.int32) % 100)
    timeit("observe 15x15", mk(lambda b, _:
        (b + obs_ops.observe(b, goals, ar, ac, None, None, None, (15, 15)).sum(axis=(1,2,3)).astype(jnp.uint16)[None,None,:], None)), board)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "ops":
        op_bench()
        raise SystemExit
    main()
