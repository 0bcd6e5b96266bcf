"""Reference (oracle) implementation of the SafeLife CA step in plain numpy.

This is the *executable spec* of the cellular-automaton semantics.  It is
deliberately written in terms of whole-board vector ops (no per-cell loops)
so that the JAX/Pallas kernels in :mod:`safelife_tpu.ops.life` are a direct
transcription.  It is validated bit-for-bit against golden traces recorded
from the reference C engine (``speedups_src/advance_board.c``) in
``tests/test_life_vs_golden.py``.

Semantics (re-derived from ``advance_board.c:12-120``; all neighborhoods are
3x3 Moore neighborhoods on a torus and *include the cell itself*):

* ``count``: number of alive cells in the neighborhood (self-inclusive, so a
  live cell survives iff ``count in (3, 4)``, i.e. 2 or 3 true neighbors —
  Life B3/S23).
* ``preserving / inhibiting / spawning``: a cell is affected if *any* cell in
  its neighborhood carries the flag (dead or alive; flags are not gated on
  aliveness).
* Flag inheritance for new cells uses a "seen at least twice" rule: a newborn
  cell gets a color bit iff the weighted number of neighborhood cells carrying
  it is >= 2, where live cells count once and spawning cells count *twice*
  (so any spawner's color is always inherited).  A newborn cell is
  destructible iff >= 2 of its live neighbors are destructible — this is what
  lets certain indestructible oscillators breed indestructible offspring.
* Rule application per cell, in precedence order:

  - alive:  keep the cell unchanged if it is frozen, any neighbor preserves,
    or ``count`` is 3 or 4; otherwise it dies to 0.
  - dead:   keep unchanged if frozen or any neighbor inhibits; else a cell is
    born if ``count == 3`` (inheriting doubled colors/destructibility); else
    if any neighbor spawns and ``rand < spawn_prob`` a destructible live cell
    appears (inheriting doubled colors); else keep unchanged.

* RNG contract: random draws are consumed in row-major order, only at cells
  that reach the spawn test (dead, not frozen, no inhibiting neighbor,
  ``count != 3``, spawning neighbor).  This consumption order is what makes
  bit-exact trajectory parity with the reference C engine possible; see
  :class:`safelife_tpu.utils.rng.NumpyRandomBridge`.
"""

import numpy as np

from .. import cells as C


def _neighborhood_sum(x):
    """Self-inclusive 3x3 torus sum, computed as two separable passes."""
    r = x + np.roll(x, 1, axis=-1) + np.roll(x, -1, axis=-1)
    return r + np.roll(r, 1, axis=-2) + np.roll(r, -1, axis=-2)


def _neighborhood_any(x):
    """Self-inclusive 3x3 torus logical-OR."""
    r = x | np.roll(x, 1, axis=-1) | np.roll(x, -1, axis=-1)
    return r | np.roll(r, 1, axis=-2) | np.roll(r, -1, axis=-2)


def advance_board_reference(board, spawn_prob=0.3, rng=None, rand_field=None):
    """Advance a single SafeLife board one step.  Returns a new array.

    Parameters
    ----------
    board : (H, W) uint16 array
    spawn_prob : float
        Probability of spawning a new live cell next to a spawner.
    rng : object with ``draw(n) -> float64 array``, optional
        Source of uniforms consumed in the reference's row-major order
        (e.g. :class:`safelife_tpu.utils.rng.NumpyRandomBridge`).  Used for
        bit-exact parity with the C engine.
    rand_field : (H, W) float array, optional
        Pre-drawn uniform field (used instead of ``rng``).  If both are
        None, spawning uses a fresh ``np.random`` draw per eligible cell
        via a full field.
    """
    board = np.asarray(board, dtype=np.uint16)
    alive = (board & C.ALIVE).astype(np.int32)
    frozen = (board & C.FROZEN) != 0

    count = _neighborhood_sum(alive)
    preserved = _neighborhood_any((board & C.PRESERVING) != 0)
    inhibited = _neighborhood_any((board & C.INHIBITING) != 0)
    spawning = (board & C.SPAWNING) != 0
    near_spawner = _neighborhood_any(spawning)

    # "Seen >= 2x" inheritance weights.
    def doubled(flag, spawner_double):
        has = ((board & flag) != 0).astype(np.int32)
        w = has * alive
        if spawner_double:
            w = w + 2 * has * spawning.astype(np.int32)
        return _neighborhood_sum(w) >= 2

    inherit = np.zeros_like(board)
    for color in (C.COLOR_R, C.COLOR_G, C.COLOR_B):
        inherit |= np.uint16(color) * doubled(color, spawner_double=True)
    # Quirk kept for parity: the reference engine overlays the destructible
    # bit onto the exit bit's position before counting (advance_board.c:44-46),
    # so a live cell carrying the *exit* flag also counts toward destructible
    # inheritance.  Exit cells are frozen in practice, but soups can hit this.
    destr2 = doubled(C.DESTRUCTIBLE | C.EXIT, spawner_double=False)

    is_alive = alive.astype(bool)
    survives = frozen | preserved | (count == 3) | (count == 4)
    born = (count == 3) & ~frozen & ~inhibited

    # Row-major RNG consumption at spawn-eligible cells only.
    spawn_eligible = ~is_alive & ~frozen & ~inhibited & ~born & near_spawner
    if rand_field is None:
        rand_field = np.ones(board.shape)
        n = int(spawn_eligible.sum())
        if n:
            draws = rng.draw(n) if rng is not None else np.random.random(n)
            rand_field[spawn_eligible] = draws
    spawned = spawn_eligible & (rand_field < spawn_prob)

    born_cell = np.uint16(C.ALIVE) | inherit | np.uint16(C.DESTRUCTIBLE) * destr2
    spawn_cell = np.uint16(C.ALIVE | C.DESTRUCTIBLE) | inherit

    out = np.where(
        is_alive,
        np.where(survives, board, np.uint16(0)),
        np.where(born, born_cell, np.where(spawned, spawn_cell, board)),
    ).astype(np.uint16)
    return out


def spawn_consumption_mask(board):
    """Boolean mask of cells that consume one uniform draw this step.

    Deterministic given the board (independent of the drawn values); this is
    what allows the JAX parity path to pre-draw exactly the right uniforms in
    the reference's consumption order.
    """
    board = np.asarray(board, dtype=np.uint16)
    alive = (board & C.ALIVE).astype(np.int32)
    frozen = (board & C.FROZEN) != 0
    count = _neighborhood_sum(alive)
    inhibited = _neighborhood_any((board & C.INHIBITING) != 0)
    near_spawner = _neighborhood_any((board & C.SPAWNING) != 0)
    born = (count == 3) & ~frozen & ~inhibited
    return ~alive.astype(bool) & ~frozen & ~inhibited & ~born & near_spawner
