"""Lockstep parity on hand-authored puzzle levels (BASELINE config 2).

The puzzles exercise the full cell-type vocabulary — crates (push), plants
(push/pull), fragile patterns, spawner chaos, ice cubes — so this is the
broadest action-semantics parity check: all six episodes run as ONE
lockstep batch against trajectories recorded from the reference engine.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.levels import loader
from safelife_tpu.ops import agent as agent_ops, scoring
from safelife_tpu.ops.life_numpy import spawn_consumption_mask
from safelife_tpu.utils.rng import NumpyRandomBridge

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "puzzles.npz")

PUZZLES = [
    ("corridor", "puzzles/01*"),
    ("block", "puzzles/02*"),
    ("breakout", "puzzles/08*"),
    ("pruning", "puzzles/10*"),
    ("chaos-contained", "puzzles/16*"),
    ("inside-out", "puzzles/18*"),
]


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@jax.jit
def _action_board(state, action):
    ce = scoring.can_exit(state.perf_completed, state.perf_possible,
                          state.min_performance)
    return agent_ops.execute_action(
        state.board, state.agent_row, state.agent_col, state.orientation,
        action, ce, state.game_over).board


def _spawn_field(board, spawn_prob, rng):
    mask = spawn_consumption_mask(board)
    f = np.zeros(board.shape, bool)
    n = int(mask.sum())
    if n:
        f[mask] = rng.draw(n) < spawn_prob
    return f


def test_puzzle_batch_parity(golden):
    levels = [loader.load_levels(path)[0] for _, path in PUZZLES]
    bank = loader.build_bank(levels)
    env = BatchedSafeLifeEnv(EnvConfig(auto_reset=False))
    n = len(PUZZLES)
    state = env.reset_to_levels(bank, jnp.arange(n))
    names = [name for name, _ in PUZZLES]

    board0, goals0, points0 = jax.device_get(
        (state.board, state.goals, state.points_last))
    for b, name in enumerate(names):
        np.testing.assert_array_equal(
            board0[..., b], golden[name + "/init_board"], name)
        assert points0[b] == golden[name + "/init_points"], name
    obs0 = jax.device_get(env.observe(state))
    for b, name in enumerate(names):
        np.testing.assert_array_equal(obs0[b], golden[name + "/obs0"], name)

    T = min(len(golden[name + "/actions"]) for name in names)
    actions = np.stack(
        [golden[name + "/actions"][:T] for name in names], axis=1)
    spawn_probs = [float(golden[name + "/spawn_prob"]) for name in names]
    rngs = [NumpyRandomBridge(31) for _ in names]
    key = jax.random.key(0)  # unused: spawn fields are overridden
    goals_host = goals0

    for t in range(T):
        a = jnp.asarray(actions[t])
        ab = jax.device_get(_action_board(state, a))
        fb = np.stack([_spawn_field(ab[..., b], spawn_probs[b], rngs[b])
                       for b in range(n)], axis=-1)
        fg = np.stack([_spawn_field(goals_host[..., b], spawn_probs[b],
                                    rngs[b]) for b in range(n)], axis=-1)
        state, ts = env.step(state, bank, a, key,
                             spawn_board=jnp.asarray(fb),
                             spawn_goals=jnp.asarray(fg))
        (board, goals_host, reward, arow, acol, orient, over, points) = \
            jax.device_get(
                (state.board, state.goals, ts.reward, state.agent_row,
                 state.agent_col, state.orientation, state.game_over,
                 state.points_last))
        for b, name in enumerate(names):
            msg = f"{name} step {t}"
            np.testing.assert_array_equal(
                board[..., b], golden[name + "/board"][t], msg)
            np.testing.assert_array_equal(
                goals_host[..., b], golden[name + "/goals"][t], msg)
            assert reward[b] == pytest.approx(
                float(golden[name + "/reward"][t])), msg
            assert (acol[b], arow[b]) == tuple(
                golden[name + "/agent_loc"][t]), msg
            assert orient[b] == golden[name + "/orientation"][t], msg
            assert bool(over[b]) == bool(golden[name + "/game_over"][t]), msg
            assert points[b] == golden[name + "/points"][t], msg
