"""Build LevelBanks from device arrays — no host round-trip.

``loader.build_bank`` precomputes reset-time fields in numpy (fine for
file-loaded levels); banks produced by the on-device level factory
(:mod:`safelife_tpu.procgen.batched`) stay on device end to end by
computing those fields with the jitted scoring ops instead.
"""

from functools import partial

import jax
import jax.numpy as jnp

from .. import cells as C
from ..env.state import LevelBank, find_exits
from ..ops import scoring


@partial(jax.jit, static_argnames=("max_exits", "static_goals",
                                   "spawnless", "simple_goals",
                                   "spawn_simple_goals"))
def build_bank_from_arrays(board, goals, agent_row, agent_col,
                           orientation=None, spawn_prob=None,
                           min_performance=-1.0, max_exits=4,
                           static_goals=False, spawnless=False,
                           simple_goals=False, spawn_simple_goals=None):
    """Assemble a LevelBank from (H, W, N) device arrays.

    ``static_goals`` / ``spawnless`` must be asserted by the caller (they
    are static compile-time properties; pass True only when every goal
    board is a spawner-free CA fixed point / no level contains spawners).
    """
    h, w, n = board.shape
    board = jnp.asarray(board, jnp.uint16)
    goals = jnp.asarray(goals, jnp.uint16)
    if orientation is None:
        orientation = jnp.ones(n, jnp.int32)
    if spawn_prob is None:
        spawn_prob = jnp.zeros(n, jnp.float32)
    min_performance = jnp.broadcast_to(
        jnp.asarray(min_performance, jnp.float32), (n,))

    baseline = scoring.performance_score(board, goals)
    possible0 = scoring.possible_score(goals) - baseline
    points0 = scoring.current_points(board, goals)
    can_exit0 = (min_performance < 0) | (
        0 >= min_performance * possible0.astype(jnp.float32))
    er, ec, ev = find_exits(board, max_exits)
    flat_goals = goals.reshape(h * w, n).astype(jnp.int32)
    pos = er * w + ec                                     # (K, N)
    exit_gcol = jnp.where(
        ev, (jnp.take_along_axis(flat_goals, pos, axis=0)
             >> C.COLOR_BIT) & 7, 0)

    return LevelBank(
        board=board, goals=goals,
        agent_row=jnp.asarray(agent_row, jnp.int32),
        agent_col=jnp.asarray(agent_col, jnp.int32),
        orientation=jnp.asarray(orientation, jnp.int32),
        spawn_prob=jnp.asarray(spawn_prob, jnp.float32),
        min_performance=min_performance,
        exit_row=er, exit_col=ec, exit_valid=ev, exit_gcol=exit_gcol,
        baseline_score=baseline, possible0=possible0, points0=points0,
        can_exit0=can_exit0, static_goals=static_goals,
        spawnless=spawnless, simple_goals=simple_goals,
        # simple_goals implies the weaker spawn-simple certification.
        spawn_simple_goals=(simple_goals if spawn_simple_goals is None
                            else spawn_simple_goals))
