"""Chained-latency decomposition of the fused env step (run on TPU).

Every timing feeds each iteration's output back into the next (scan with
state threading) and consumes all outputs — independent repeated calls
overlap in the remote executor and report impossibly fast times.
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.levels import loader, synth
from safelife_tpu.ops import env_step_pallas as esp
from safelife_tpu.ops import obs as obs_ops

B = 16384
STEPS = 64
ROLLOUT = 20


def timeit(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    per_step = best / STEPS
    print(f"{name:40s} {per_step*1e6:9.1f} us/step  "
          f"{B*STEPS/best/1e6:8.2f} M env-steps/s")
    return out


def env_loop(env, bank, use_fresh=True, consume_obs=True):
    key = jax.random.PRNGKey(0)
    state = env.reset_all(bank, B, key)

    @jax.jit
    def run(state, key):
        def outer(carry, _):
            state, key = carry
            key, k_fresh = jax.random.split(key)
            fresh = env.sample_fresh_levels(bank, B, k_fresh) if use_fresh \
                else None

            def body(carry, _):
                state, key = carry
                key, ka, ke = jax.random.split(key, 3)
                action = jax.random.randint(ka, (B,), 0, 9)
                state, ts = env.step(state, bank, action, ke,
                                     fresh_levels=fresh)
                out = ts.reward.sum()
                if consume_obs and ts.obs is not None:
                    out = out + ts.obs.astype(jnp.int32).sum()
                return (state, key), out
            (state, key), r = jax.lax.scan(body, (state, key),
                                           length=ROLLOUT)
            return (state, key), r.sum()
        (state, key), r = jax.lax.scan(outer, (state, key),
                                       length=STEPS // ROLLOUT)
        return state, key, r.sum()
    return run, (state, key)


def main():
    try:
        bank = loader.load_bank("benchmarks/v1.0/append-still.npz")
    except Exception:
        bank = synth.synth_bank(64, h=26, w=26, spawners=False)
    print(f"bank: static_goals={bank.static_goals} spawnless={bank.spawnless}"
          f" B={B}")
    global STEPS
    STEPS = 60  # multiple of ROLLOUT

    for name, cfg, kw in [
        ("full step (obs, reset, fresh)",
         EnvConfig(view_shape=(15, 15)), {}),
        ("step packed-obs (output_channels=None)",
         EnvConfig(view_shape=(15, 15), output_channels=None), {}),
        ("step no obs",
         EnvConfig(compute_obs=False), {}),
        ("step no obs no reset",
         EnvConfig(compute_obs=False, auto_reset=False), {}),
    ]:
        env = BatchedSafeLifeEnv(cfg)
        run, init = env_loop(env, bank, **kw)
        timeit(name, run, *init)

    # --- raw kernels, chained ------------------------------------------
    lv = bank.take(jnp.arange(B) % bank.num_levels)
    board = lv.board

    # action kernel alone (board fed back)
    si = jnp.zeros((8, B), jnp.int32).at[0].set(2)

    block = esp.LANES
    h, w, _ = board.shape
    grid = (B // block,)
    board_spec = pl.BlockSpec((h, w, block), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    bshape = jax.ShapeDtypeStruct((h, w, B), jnp.uint16)

    @jax.jit
    def action_only(board):
        def body(b, _):
            b2, act_i = pl.pallas_call(
                esp._action_kernel,
                grid=grid,
                in_specs=[lane_spec(8), board_spec],
                out_specs=(board_spec, lane_spec(4)),
                out_shape=(bshape, jax.ShapeDtypeStruct((4, B), jnp.int32)),
            )(si, b)
            return b2, act_i[0].sum()
        b, outs = jax.lax.scan(body, board, length=STEPS)
        return b, outs.sum()
    timeit("action kernel only", action_only, board)

    # fused advance (no reset fold): via fused_step time_limit=0 minus action
    zeros = jnp.zeros(B, jnp.int32)
    zf = jnp.zeros(B, jnp.float32)

    @jax.jit
    def fused_noreset(board):
        def body(b, _):
            out = esp.fused_step(
                b, lv.goals, lv.board, zeros, lv.agent_row.astype(jnp.int32),
                lv.agent_col.astype(jnp.int32), zeros, zeros, zeros,
                lv.baseline_score, zf, zf, 3,
                static_goals=bank.static_goals, spawnless=bank.spawnless,
                perf_possible=lv.possible0 if bank.static_goals else None)
            return out[0], out[6].sum()
        b, outs = jax.lax.scan(body, board, length=STEPS)
        return b, outs.sum()
    timeit("action+advance kernels (no fold)", fused_noreset, board)

    # obs unpack+transpose alone, chained
    view = jnp.ones((15, 15, B), jnp.uint16)

    @jax.jit
    def unpack_loop(view):
        def body(v, _):
            u = obs_ops.unpack_channels(v, tuple(range(15)))
            fed = u.sum(axis=(1, 2, 3)).astype(jnp.uint16)
            return v + fed[None, None, :], u.astype(jnp.int32).sum()
        v, outs = jax.lax.scan(body, view, length=STEPS)
        return v, outs.sum()
    timeit("obs unpack_channels (transpose+bits)", unpack_loop, view)

    # dynamic-goals variants
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(15, 15)))
    try:
        dyn_real = loader.load_bank("benchmarks/v1.0/append-dynamic.npz")
        print(f"append-dynamic: simple_goals={dyn_real.simple_goals} "
              f"spawnless={dyn_real.spawnless}")
        run, init = env_loop(env, dyn_real)
        timeit("full step append-dynamic suite", run, *init)
    except Exception as e:
        print(f"append-dynamic skipped: {e}")
    dyn = synth.synth_bank(64, h=26, w=26, spawners=True, dynamic_goals=True)
    run, init = env_loop(env, dyn)
    timeit("full step synth dyn (goal spawner)", run, *init)


if __name__ == "__main__":
    main()
