"""Batched SafeLife CA step in JAX — the hot kernel of the framework.

TPU-first design notes
----------------------
* **Layout**: boards are ``(H, W, ...)`` with *batch trailing*.  On TPU the
  last two array dims are tiled ``(sublane, 128-lane)``; with batch last, the
  128 vector lanes run across boards (perfect utilization for any batch that
  is a multiple of 128), while the small ``W`` dim only pads sublanes.  The
  naive ``(B, H, W)`` layout would waste ~6x compute/memory padding 26x26 to
  a 32x128 tile.
* **One packed conv**: the rules need five neighborhood counts (alive, three
  color-inheritance weights, destructible weight).  These are packed into
  5-bit fields of a single int32 plane so one separable 3x3 torus sum
  produces all of them (cf. the reference's 4-bit packing trick in
  ``speedups_src/advance_board.c:12-32``, generalized).  Flag *presence*
  (preserving / inhibiting / spawning) is a single bitwise-OR conv pass.
* **Randomness is an input**: the kernel takes a pre-computed boolean
  ``spawn`` field instead of drawing uniforms, so the same kernel serves
  - the fast path (field from on-device counter RNG), and
  - the bit-exact parity path (field computed on host in float64 from the
    reference's MT19937 stream; see ``tests/test_life_jax.py``).

Semantics match :mod:`safelife_tpu.ops.life_numpy` (the executable spec),
which is bit-exact against the reference C engine
(``speedups_src/advance_board.c:34-120``).
"""

from functools import partial

import jax
import jax.numpy as jnp

from .. import cells as C

_U16 = jnp.uint16


def nb_sum(x):
    """Self-inclusive 3x3 torus sum over the leading (H, W) axes."""
    r = x + jnp.roll(x, 1, axis=1) + jnp.roll(x, -1, axis=1)
    return r + jnp.roll(r, 1, axis=0) + jnp.roll(r, -1, axis=0)


def nb_or(x):
    """Self-inclusive 3x3 torus bitwise-OR over the leading (H, W) axes."""
    r = x | jnp.roll(x, 1, axis=1) | jnp.roll(x, -1, axis=1)
    return r | jnp.roll(r, 1, axis=0) | jnp.roll(r, -1, axis=0)


def advance_board(board, spawn):
    """Advance SafeLife boards one CA step.

    Parameters
    ----------
    board : uint16 array, shape (H, W, ...)
        Any number of trailing batch dims (usually one: the env batch).
    spawn : bool array, same shape
        True where a spawn event fires *if* the cell is spawn-eligible;
        typically ``uniform(key, shape) < spawn_prob``.

    Returns
    -------
    uint16 array, same shape.
    """
    board = board.astype(_U16)
    i32 = jnp.int32

    alive = (board & 1).astype(i32)
    spawning = ((board >> C.SPAWNING_BIT) & 1).astype(i32)
    # Color weights: live cells count once, spawners twice ("spawner colors
    # always inherit"); destructible weight counts live cells whose
    # destructible-or-exit bit is set (exit aliasing quirk — see life_numpy).
    w = alive * 3  # spawner-boost factor shared below
    has_r = ((board >> C.COLOR_BIT) & 1).astype(i32)
    has_g = ((board >> (C.COLOR_BIT + 1)) & 1).astype(i32)
    has_b = ((board >> (C.COLOR_BIT + 2)) & 1).astype(i32)
    cw = alive + 2 * spawning
    has_d = (((board >> C.DESTRUCTIBLE_BIT) | (board >> C.EXIT_BIT)) & 1).astype(i32)

    packed = (alive
              + ((has_r * cw) << 5)
              + ((has_g * cw) << 10)
              + ((has_b * cw) << 15)
              + ((has_d * alive) << 20))
    del w
    counts = nb_sum(packed)

    n_alive = counts & 31
    inherit = (((counts >> 5) & 31) >= 2).astype(_U16) * _U16(C.COLOR_R)
    inherit |= (((counts >> 10) & 31) >= 2).astype(_U16) * _U16(C.COLOR_G)
    inherit |= (((counts >> 15) & 31) >= 2).astype(_U16) * _U16(C.COLOR_B)
    destr2 = ((counts >> 20) & 31) >= 2

    flags = nb_or(board)
    preserved = (flags & C.PRESERVING) != 0
    inhibited = (flags & C.INHIBITING) != 0
    near_spawner = (flags & C.SPAWNING) != 0

    is_alive = (board & 1) != 0
    frozen = (board & C.FROZEN) != 0
    three = n_alive == 3
    survives = frozen | preserved | three | (n_alive == 4)
    born = three & ~frozen & ~inhibited
    spawned = (~frozen & ~inhibited & ~born & near_spawner
               & jnp.asarray(spawn, bool))

    born_cell = _U16(C.ALIVE) | inherit | jnp.where(
        destr2, _U16(C.DESTRUCTIBLE), _U16(0))
    spawn_cell = _U16(C.ALIVE | C.DESTRUCTIBLE) | inherit

    return jnp.where(
        is_alive,
        jnp.where(survives, board, _U16(0)),
        jnp.where(born, born_cell, jnp.where(spawned, spawn_cell, board)),
    )


@partial(jax.jit, static_argnames=())
def advance_board_sampled(board, spawn_prob, key):
    """Fast path: draw the spawn field on device and advance.

    ``spawn_prob`` may be a scalar or broadcastable to the trailing batch
    dims (per-board spawn probabilities).
    """
    u = jax.random.uniform(key, board.shape, jnp.float32)
    spawn = u < jnp.asarray(spawn_prob, jnp.float32)
    return advance_board(board, spawn)
