"""Sharded-board CA: halo exchange for boards larger than one device.

SafeLife's benchmark boards are tiny (26x26) and scale by batching; this
module covers the other axis (SURVEY.md §5.7): boards whose HEIGHT is
sharded over the mesh's 'data' axis, with each step exchanging the 1-cell
toroidal border between ring neighbors via ``jax.lax.ppermute`` inside
``shard_map`` — the cellular-automaton analog of ring attention.  All
communication rides ICI; per step each device sends exactly two rows.
"""

from functools import partial

import jax
import jax.numpy as jnp
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import cells as C
from .mesh import DATA_AXIS

_U16 = jnp.uint16


def _advance_open_rows(board, spawn):
    """CA advance on a row-padded block: axis 0 is open (first/last row are
    halo rows whose outputs are discarded), axis 1 wraps (torus).  Same
    semantics as ops.life.advance_board otherwise."""
    board = board.astype(_U16)
    i32 = jnp.int32

    alive = (board & 1).astype(i32)
    spawning = ((board >> C.SPAWNING_BIT) & 1).astype(i32)
    has_r = ((board >> C.COLOR_BIT) & 1).astype(i32)
    has_g = ((board >> (C.COLOR_BIT + 1)) & 1).astype(i32)
    has_b = ((board >> (C.COLOR_BIT + 2)) & 1).astype(i32)
    cw = alive + 2 * spawning
    has_d = (((board >> C.DESTRUCTIBLE_BIT) | (board >> C.EXIT_BIT)) & 1
             ).astype(i32)

    packed = (alive
              + ((has_r * cw) << 5)
              + ((has_g * cw) << 10)
              + ((has_b * cw) << 15)
              + ((has_d * alive) << 20))

    def row_shift(x, k):
        # open boundary along axis 0: shift and zero-fill
        if k == 0:
            return x
        pad = jnp.zeros_like(x[:abs(k)])
        return jnp.concatenate([x[k:], pad]) if k > 0 \
            else jnp.concatenate([pad, x[:k]])

    def nb_sum(x):
        r = x + jnp.roll(x, 1, axis=1) + jnp.roll(x, -1, axis=1)
        return r + row_shift(r, 1) + row_shift(r, -1)

    def nb_or(x):
        r = x | jnp.roll(x, 1, axis=1) | jnp.roll(x, -1, axis=1)
        return r | row_shift(r, 1) | row_shift(r, -1)

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
        jnp.where(born, born_cell, jnp.where(spawned, spawn_cell, board)))


def advance_board_sharded(board, spawn, mesh, axis=DATA_AXIS):
    """One CA step for a (H, W[, B]) board row-sharded over ``axis``.

    ``board`` must be shardable: H divisible by the axis size.  Returns the
    advanced board with the same sharding.  Communication: one ppermute of
    one row in each ring direction per step.
    """
    n_dev = mesh.shape[axis]
    spec = P(axis)

    @partial(shard_map, mesh=mesh, in_specs=(spec, spec), out_specs=spec)
    def step(local, local_spawn):
        idx = jax.lax.axis_index(axis)
        del idx  # ring permutes are index-free
        up_perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        down_perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        # Send my last row to my lower neighbor's top halo, and my first
        # row to my upper neighbor's bottom halo (torus ring).
        top_halo = jax.lax.ppermute(local[-1:], axis, perm=up_perm)
        bottom_halo = jax.lax.ppermute(local[:1], axis, perm=down_perm)
        padded = jnp.concatenate([top_halo, local, bottom_halo], axis=0)
        pad_spawn = jnp.concatenate(
            [jnp.zeros_like(local_spawn[:1]), local_spawn,
             jnp.zeros_like(local_spawn[:1])], axis=0)
        return _advance_open_rows(padded, pad_spawn)[1:-1]

    board = jax.device_put(board, NamedSharding(mesh, spec))
    spawn = jax.device_put(spawn, NamedSharding(mesh, spec))
    return step(board, spawn)
