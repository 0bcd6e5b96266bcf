"""Bit-exact parity of the CA step against golden traces from the C engine."""

import os

import numpy as np
import pytest

from safelife_tpu.ops.life_numpy import advance_board_reference
from safelife_tpu.utils.rng import NumpyRandomBridge

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ca_steps.npz")


def golden_cases():
    data = np.load(GOLDEN)
    names = sorted({k.split("/")[0] for k in data.files})
    return names


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.mark.parametrize("name", golden_cases())
def test_numpy_oracle_matches_c_engine(golden, name):
    board = golden[name + "/input"]
    steps = golden[name + "/steps"]
    spawn_prob = float(golden[name + "/spawn_prob"])
    rng = NumpyRandomBridge(17)
    b = board
    for t in range(steps.shape[0]):
        b = advance_board_reference(b, spawn_prob, rng=rng)
        np.testing.assert_array_equal(
            b, steps[t], err_msg=f"{name}: mismatch at step {t}")
