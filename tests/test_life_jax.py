"""JAX CA step: parity vs the numpy oracle, the golden C traces, and
batched-vs-single lockstep invariance."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import safelife_tpu.cells as C
from safelife_tpu.ops import life
from safelife_tpu.ops.life_numpy import (
    advance_board_reference, spawn_consumption_mask)
from safelife_tpu.utils.rng import NumpyRandomBridge

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ca_steps.npz")


# One compile per board shape instead of ~40 per-op eager compiles: XLA
# compiles in this environment have a large fixed latency, so tests must
# route everything through jit.
_adv = jax.jit(life.advance_board)


def parity_spawn_field(board, spawn_prob, rng):
    """Draw the spawn decisions exactly as the C engine would (float64,
    row-major consumption order)."""
    mask = spawn_consumption_mask(board)
    field = np.zeros(board.shape, dtype=bool)
    n = int(mask.sum())
    if n:
        field[mask] = rng.draw(n) < spawn_prob
    return field


def jax_step_parity(board, spawn_prob, rng):
    field = parity_spawn_field(board, spawn_prob, rng)
    out = _adv(jnp.asarray(board), jnp.asarray(field))
    return np.asarray(out)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def golden_cases():
    data = np.load(GOLDEN)
    return sorted({k.split("/")[0] for k in data.files})


@pytest.mark.parametrize("name", golden_cases())
def test_jax_matches_c_engine(golden, name):
    board = golden[name + "/input"]
    steps = golden[name + "/steps"]
    spawn_prob = float(golden[name + "/spawn_prob"])
    rng = NumpyRandomBridge(17)
    b = board
    for t in range(steps.shape[0]):
        b = jax_step_parity(b, spawn_prob, rng)
        np.testing.assert_array_equal(
            b, steps[t], err_msg=f"{name}: mismatch at step {t}")


def test_jax_matches_oracle_on_random_soups():
    rng = np.random.RandomState(7)
    flags = np.array(
        [C.ALIVE, C.AGENT, C.PUSHABLE, C.DESTRUCTIBLE, C.FROZEN,
         C.PRESERVING, C.INHIBITING, C.SPAWNING, C.EXIT,
         C.COLOR_R, C.COLOR_G, C.COLOR_B, C.PULLABLE], dtype=np.uint16)
    for trial in range(5):
        board = np.zeros((13, 19), np.uint16)
        for f in flags:
            board |= f * (rng.random(board.shape) < 0.15).astype(np.uint16)
        field = rng.random(board.shape) < 0.35
        want = advance_board_reference(board, 1.0, rand_field=np.where(field, 0.0, 1.0))
        got = np.asarray(_adv(jnp.asarray(board), jnp.asarray(field)))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_batched_lockstep_equals_single(golden):
    """Advancing a batch must equal advancing each board independently."""
    names = [n for n in golden_cases() if golden[n + "/input"].shape == (26, 26)]
    boards = np.stack([golden[n + "/input"] for n in names], axis=-1)  # (H,W,B)
    rs = np.random.RandomState(3)
    field = rs.random(boards.shape) < 0.3

    batched = np.asarray(_adv(jnp.asarray(boards), jnp.asarray(field)))
    for i in range(boards.shape[-1]):
        single = np.asarray(_adv(
            jnp.asarray(boards[..., i]), jnp.asarray(field[..., i])))
        np.testing.assert_array_equal(batched[..., i], single)


def test_sampled_path_runs_under_jit():
    key = jax.random.key(0)
    board = jnp.zeros((16, 16, 8), jnp.uint16)
    board = board.at[4, 4:7, :].set(jnp.uint16(C.LIFE))
    out = life.advance_board_sampled(board, 0.3, key)
    assert out.dtype == jnp.uint16 and out.shape == board.shape
    # blinker flips orientation
    assert int((out[:, :, 0] & 1).sum()) == 3
