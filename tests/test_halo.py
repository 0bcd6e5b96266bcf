"""Sharded-board halo-exchange CA must match the single-device torus CA."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from safelife_tpu import cells as C
from safelife_tpu.ops import life
from safelife_tpu.parallel import mesh as pmesh
from safelife_tpu.parallel.halo import advance_board_sharded


@pytest.mark.heavy
def test_sharded_advance_matches_global():
    mesh = pmesh.make_mesh()  # 8 CPU devices on the data axis
    rng = np.random.RandomState(0)
    h, w = 64, 32  # h divisible by 8
    board = np.zeros((h, w), np.uint16)
    # random soup of life, walls, trees, spawners near the shard borders
    board[rng.rand(h, w) < 0.3] = C.LIFE | C.COLOR_G
    board[rng.rand(h, w) < 0.05] = C.WALL
    board[rng.rand(h, w) < 0.03] = C.TREE
    board[rng.rand(h, w) < 0.02] = C.SPAWNER
    spawn = rng.rand(h, w) < 0.2

    expected = np.asarray(life.advance_board(
        jnp.asarray(board)[..., None], jnp.asarray(spawn)[..., None]))[..., 0]
    got = advance_board_sharded(
        jnp.asarray(board), jnp.asarray(spawn), mesh)
    np.testing.assert_array_equal(np.asarray(got), expected)


@pytest.mark.heavy
def test_sharded_advance_multi_step():
    mesh = pmesh.make_mesh()
    h, w = 32, 16
    board = np.zeros((h, w), np.uint16)
    board[3, 4:7] = C.LIFE  # blinker crossing shard 0/1 boundary (rows 3-5)
    board[15:18, 8] = C.LIFE  # blinker crossing shard 3/4 boundary
    spawn = jnp.zeros((h, w), bool)
    b_sharded = jnp.asarray(board)
    b_global = jnp.asarray(board)[..., None]
    for _ in range(4):
        b_sharded = advance_board_sharded(b_sharded, spawn, mesh)
        b_global = life.advance_board(b_global, spawn[..., None])
    np.testing.assert_array_equal(
        np.asarray(b_sharded), np.asarray(b_global)[..., 0])


def test_scaling_report_harness():
    from safelife_tpu.parallel.distributed import scaling_report
    import jax.numpy as jnp

    def step(x):
        return (x * 2 + 1).sum()

    rep = scaling_report(step, [1, 2],
                         make_args=lambda n: (jnp.ones((n, 64)),),
                         repeats=2)
    assert len(rep) == 2
    assert all(r["time"] > 0 and "efficiency" in r for r in rep)
