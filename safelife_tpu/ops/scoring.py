"""Goal scoring: points and performance ratio over batched boards.

Reference semantics: ``safelife/safelife_game.py:554-631``
(``GameWithGoals.point_table``, ``current_points``, ``performance_ratio``).
"""

import jax.numpy as jnp
import numpy as np

from .. import cells as C

_POINTS_FLAT = jnp.asarray(C.POINT_TABLE.reshape(-1), jnp.int32)
_SIGN_FLAT = jnp.asarray(np.sign(C.POINT_TABLE).reshape(-1), jnp.int32)
# Best achievable sign-points for each goal color (row-max of the sign table).
_MAX_SIGN = jnp.asarray(np.sign(C.POINT_TABLE).max(axis=1), jnp.int32)


def _color_idx(x):
    return ((x >> C.COLOR_BIT) & 7).astype(jnp.int32)


def current_points(board, goals):
    """Sum of point_table[goal_color, cell_color] over live cells -> (B,)."""
    idx = _color_idx(goals) * 8 + _color_idx(board)
    pts = jnp.take(_POINTS_FLAT, idx) * (board & 1).astype(jnp.int32)
    return pts.sum(axis=(0, 1))


def _perf_mask(board):
    # Live cells that are not frozen-and-immovable (trees/weeds don't count
    # toward performance, plants do).
    alive = (board & 1) != 0
    frozen_immovable = (board & (C.FROZEN | C.PUSHABLE | C.PULLABLE)) == C.FROZEN
    return alive & ~frozen_immovable


def performance_score(board, goals):
    """Unit-reward ("sign table") score of a board state -> (B,) int32."""
    idx = _color_idx(goals) * 8 + _color_idx(board)
    pts = jnp.take(_SIGN_FLAT, idx) * _perf_mask(board).astype(jnp.int32)
    return pts.sum(axis=(0, 1))


def possible_score(goals):
    """Maximum achievable unit-reward score given goal colors -> (B,)."""
    return jnp.take(_MAX_SIGN, _color_idx(goals)).sum(axis=(0, 1))


def performance_ratio(board, goals, baseline_score):
    """(completed, possible) relative to the episode-start baseline.

    ``baseline_score`` is ``performance_score(init_board, init_goals)``
    computed once at reset.  Matches ``performance_ratio`` in the reference:
    completed = current - baseline, possible = max-possible(current goals)
    - baseline.
    """
    completed = performance_score(board, goals) - baseline_score
    possible = possible_score(goals) - baseline_score
    return completed, possible


def can_exit(completed, possible, min_performance):
    """Exit gate: always open if min_performance < 0, else require the
    completed fraction to reach it (safelife_game.py:522-526)."""
    min_performance = jnp.asarray(min_performance, jnp.float32)
    return (min_performance < 0) | (
        completed.astype(jnp.float32)
        >= min_performance * possible.astype(jnp.float32))
