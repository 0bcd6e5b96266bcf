"""The shipped level data is complete and usable end to end.

Every packaged benchmark suite (levels/data/benchmarks/v1.0, generated
by `gen-benchmarks`) and every packaged puzzle must load into a device
bank and run under the batched env; the suite list must match the
reference's 8 benchmark task families.
"""

import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from safelife_tpu import cells as C
from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.levels import loader

DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "safelife_tpu", "levels", "data")

REFERENCE_TASKS = {
    "append-still", "append-dynamic", "append-spawn", "prune-still",
    "prune-still-hard", "prune-dynamic", "prune-spawn", "navigation",
}


def test_all_eight_suites_ship():
    shipped = {os.path.basename(f)[:-4] for f in
               glob.glob(os.path.join(DATA, "benchmarks", "v1.0", "*.npz"))}
    assert shipped == REFERENCE_TASKS


@pytest.mark.parametrize("task", sorted(REFERENCE_TASKS))
def test_suite_loads_and_runs(task):
    bank = loader.build_bank(loader.load_levels(
        os.path.join(DATA, "benchmarks", "v1.0", f"{task}.npz")))
    assert bank.num_levels == 100
    # Task-family invariants of the generated data.
    board = np.asarray(bank.board)
    if task.endswith("spawn"):
        assert not bank.spawnless
        assert (board & C.SPAWNING).any()
    if task.endswith("still") or task == "prune-still-hard":
        assert bank.static_goals and bank.spawnless
    assert (np.asarray(bank.possible0) > 0).all() or task == "navigation"

    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(15, 15), time_limit=20))
    state = env.reset_all(bank, 8, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, ka, ke = jax.random.split(key, 3)
        state, ts = env.step(state, bank,
                             jax.random.randint(ka, (8,), 0, 9), ke)
    assert np.isfinite(np.asarray(ts.reward)).all()


def test_puzzles_ship_and_load():
    files = sorted(glob.glob(os.path.join(DATA, "puzzles", "*.npz")))
    assert len(files) >= 8
    from safelife_tpu.game import SafeLifeGame
    for f in files:
        g = SafeLifeGame.load(f)
        assert (g.board & C.AGENT).any() and (g.board & C.EXIT).any()
