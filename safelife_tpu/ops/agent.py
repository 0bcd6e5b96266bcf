"""Vectorized agent action execution over a batch of boards.

Reference semantics: ``safelife/safelife_game.py:294-393`` (``relative_loc``,
``move_agent``, ``execute_action``).  The reference mutates 1-4 cells of a
single board with branchy Python; here every branch becomes a masked select
over the whole ``(H, W, B)`` batch so all boards execute their (different)
actions in lockstep on the VPU.

Action encoding (matches ``SafeLifeEnv.action_names``):

    0        NULL
    1 - 4    MOVE UP / RIGHT / DOWN / LEFT
    5 - 8    TOGGLE UP / RIGHT / DOWN / LEFT

Both MOVE and TOGGLE first set the agent's orientation to the named
direction.  Cells touched (relative to agent at ``p0``, facing ``d``):
``p1`` = 1 forward, ``p2`` = 1 backward (pull source), ``p3`` = 2 forward
(push target).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import cells as C

_U16 = jnp.uint16

# Orientation 0..3 = UP, RIGHT, DOWN, LEFT; rows grow downward.
_DR = np.array([-1, 0, 1, 0], np.int32)  # numpy: no device init at import
_DC = np.array([0, 1, 0, -1], np.int32)


class ActionResult(NamedTuple):
    board: jnp.ndarray        # (H, W, B) uint16
    agent_row: jnp.ndarray    # (B,) int32
    agent_col: jnp.ndarray    # (B,) int32
    orientation: jnp.ndarray  # (B,) int32
    exited: jnp.ndarray       # (B,) bool — agent stepped onto an open exit
    reward: jnp.ndarray       # (B,) float32 — exit reward only


def gather_cells(board, rows, cols):
    """Gather per-board scalar cells: board (H, W, B), rows/cols (..., B)."""
    h, w, b = board.shape
    flat = board.reshape(h * w, b)
    idx = rows * w + cols
    if idx.ndim == 1:
        idx = idx[None, :]
        return jnp.take_along_axis(flat, idx, axis=0)[0]
    return jnp.take_along_axis(flat, idx, axis=0)


def _cell_mask(shape, rows, cols):
    """(H, W, B) bool one-hot mask of per-board positions."""
    h, w, _ = shape
    r_iota = jnp.arange(h, dtype=jnp.int32)[:, None, None]
    c_iota = jnp.arange(w, dtype=jnp.int32)[None, :, None]
    return (r_iota == rows[None, None, :]) & (c_iota == cols[None, None, :])


def _masked_set(board, rows, cols, value, active):
    """Set per-board cells where ``active``; ``value`` is (B,) uint16."""
    mask = _cell_mask(board.shape, rows, cols) & active[None, None, :]
    return jnp.where(mask, value[None, None, :], board)


def execute_action(board, agent_row, agent_col, orientation, action,
                   can_exit, game_over,
                   points_on_level_exit=1.0,
                   can_toggle_powers=False, can_toggle_colors=False):
    """Execute one action per board.  All args batched over trailing B."""
    h, w, b = board.shape
    action = action.astype(jnp.int32)
    act_dir = (action - 1) % 4

    is_move = (action >= 1) & (action <= 4) & ~game_over
    is_toggle = (action >= 5) & (action <= 8) & ~game_over
    new_orient = jnp.where(is_move | is_toggle, act_dir, orientation)

    dr = jnp.asarray(_DR)[new_orient]
    dc = jnp.asarray(_DC)[new_orient]
    r0, c0 = agent_row, agent_col
    r1, c1 = (r0 + dr) % h, (c0 + dc) % w
    r2, c2 = (r0 - dr) % h, (c0 - dc) % w
    r3, c3 = (r0 + 2 * dr) % h, (c0 + 2 * dc) % w

    rows = jnp.stack([r0, r1, r2, r3])
    cols = jnp.stack([c0, c1, c2, c3])
    v0, v1, v2, v3 = gather_cells(board, rows, cols)

    # ---- MOVE ----------------------------------------------------------
    front_empty = v1 == 0
    front_exit = ~front_empty & ((v1 & C.EXIT) != 0) & can_exit
    pushable = ~front_empty & ~front_exit & ((v1 & C.PUSHABLE) != 0)
    push_to_empty = pushable & (v3 == 0)
    push_out_exit = pushable & (v3 != 0) & ((v3 & C.EXIT) != 0)
    moved = is_move & (front_empty | push_to_empty | push_out_exit)
    exited = is_move & front_exit
    pulled = moved & ((v2 & C.PULLABLE) != 0)

    # ---- TOGGLE --------------------------------------------------------
    player_color = v0 & _U16(C.COLORS)
    tgl_create = is_toggle & (v1 == 0)
    tgl_destroy = is_toggle & (v1 != 0) & ((v1 & C.DESTRUCTIBLE) != 0)
    toggle_bits = _U16(C.POWERS * bool(can_toggle_powers)
                       | C.COLORS * bool(can_toggle_colors))
    tgl_absorb = is_toggle & (v1 != 0) & ((v1 & C.DESTRUCTIBLE) == 0)

    # ---- masked writes (each position written at most once) ------------
    # p3: pushed cell lands (only when pushing into empty space).
    new_board = _masked_set(board, r3, c3, v1, is_move & push_to_empty)
    # p1: agent moves in, or toggle creates/destroys.
    p1_val = jnp.where(moved, v0,
                       jnp.where(tgl_create,
                                 _U16(C.LIFE) | player_color, _U16(0)))
    new_board = _masked_set(new_board, r1, c1, p1_val,
                            moved | tgl_create | tgl_destroy)
    # p2: pulled cell leaves.
    new_board = _masked_set(new_board, r2, c2, jnp.zeros_like(v2), pulled)
    # p0: agent leaves (possibly replaced by pulled cell), or absorbs powers.
    p0_val = jnp.where(pulled, v2,
                       jnp.where(tgl_absorb, v0 ^ (v1 & toggle_bits),
                                 _U16(0)))
    new_board = _masked_set(new_board, r0, c0, p0_val, moved | tgl_absorb)

    return ActionResult(
        board=new_board,
        agent_row=jnp.where(moved, r1, r0),
        agent_col=jnp.where(moved, c1, c0),
        orientation=new_orient,
        exited=exited,
        reward=exited.astype(jnp.float32) * jnp.float32(points_on_level_exit),
    )
