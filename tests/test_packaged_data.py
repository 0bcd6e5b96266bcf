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
@pytest.mark.heavy
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


# ---------------------------------------------------------------------------
# Hand-authored teaching sets (mazes / patterns / examples / puzzles 09-18).
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("category,count", [
    ("mazes", 11), ("patterns", 4), ("examples", 16), ("puzzles", 18)])
def test_teaching_sets_ship_load_and_run(category, count):
    files = glob.glob(os.path.join(DATA, category, "*.npz"))
    assert len(files) >= count, f"{category}: {len(files)} < {count}"
    levels = loader.load_levels(os.path.join(DATA, category))
    groups = loader.group_by_shape(levels)
    for shape, lvls in groups.items():
        bank = loader.build_bank(lvls)
        n = bank.num_levels
        env = BatchedSafeLifeEnv(EnvConfig(view_shape=(15, 15),
                                           time_limit=30))
        state = env.reset_to_levels(bank, jnp.arange(n))
        key = jax.random.PRNGKey(0)
        for _ in range(3):
            key, ka, ke = jax.random.split(key, 3)
            state, ts = env.step(
                state, bank, jax.random.randint(ka, (n,), 0, 9), ke)
        assert np.isfinite(np.asarray(ts.reward)).all()


def test_maze_oscillators_oscillate():
    """The mazes' resident patterns are genuine period-2 oscillators:
    two CA steps return the initial board (with the agent untouched)."""
    from safelife_tpu.ops import life_numpy

    files = sorted(glob.glob(os.path.join(DATA, "mazes", "*.npz")))
    oscillating = 0
    for f in files:
        lv = loader.load_levels(f)[0]
        b0 = lv["board"] & ~np.uint16(C.AGENT)
        b1 = life_numpy.advance_board_reference(
            b0, 0.0, rand_field=np.ones(b0.shape))
        b2 = life_numpy.advance_board_reference(
            b1, 0.0, rand_field=np.ones(b0.shape))
        np.testing.assert_array_equal(
            b2, b0, err_msg=f"{os.path.basename(f)} not period<=2")
        if not np.array_equal(b1, b0):
            oscillating += 1
    assert oscillating >= 6, f"only {oscillating} mazes have live oscillators"


# ---------------------------------------------------------------------------
# Legacy v0.1 benchmark set (reference levels/benchmarks/v0.1: 28 procgen
# archives + bipole + box-side-effect, one 25x25 level per npz).
# ---------------------------------------------------------------------------

V01_NAMES = (
    ["%s-%d" % (t, i) for t in (
        "append-still", "append-dynamic", "append-stochastic",
        "prune-still", "prune-dynamic", "prune-stochastic") for i in (1, 2, 3, 4)]
    + ["%s-%d" % (t, i) for t in (
        "append-stochastic-osc", "prune-stochastic-osc") for i in (1, 2)]
    + ["bipole", "box-side-effect"])


def test_v01_suite_ships_loads_and_runs():
    root = os.path.join(DATA, "benchmarks", "v0.1")
    shipped = {os.path.basename(f)[:-4] for f in
               glob.glob(os.path.join(root, "*.npz"))}
    assert shipped == set(V01_NAMES)
    levels = loader.load_levels(root)
    assert len(levels) == 30
    bank = loader.build_bank(levels)
    assert bank.board.shape[:2] == (25, 25)
    n = bank.num_levels
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(15, 15), time_limit=20))
    state = env.reset_to_levels(bank, jnp.arange(n))
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        key, ka, ke = jax.random.split(key, 3)
        state, ts = env.step(state, bank,
                             jax.random.randint(ka, (n,), 0, 9), ke)
    assert np.isfinite(np.asarray(ts.reward)).all()
    # The stochastic tasks carry spawners; the procgen tasks carry goals.
    by_name = {lv["name"]: lv for lv in levels}
    assert (by_name["append-stochastic-1"]["board"] & C.SPAWNING).any()
    assert (by_name["prune-dynamic-1"]["goals"] != 0).any()


def test_v01_hand_levels_are_stable_disruption_tests():
    """bipole's poles are genuine period-2 oscillators and both hand
    levels are agent-reachable exit tasks with no goal patterns."""
    from safelife_tpu.game import SafeLifeGame
    from safelife_tpu.ops import life_numpy

    for name, period in [("bipole", 2), ("box-side-effect", 1)]:
        g = SafeLifeGame.load(
            os.path.join(DATA, "benchmarks", "v0.1", name + ".npz"))
        assert (g.board & C.AGENT).any() and (g.board & C.EXIT).any()
        assert not g.goals.any()
        b0 = g.board & ~np.uint16(C.AGENT)
        b = b0
        for _ in range(period):
            b = life_numpy.advance_board_reference(
                b, 0.0, rand_field=np.ones(b.shape))
        np.testing.assert_array_equal(b, b0, err_msg=name)


def test_examples_cover_every_cell_type():
    """The example set exercises the full cell-type vocabulary."""
    levels = loader.load_levels(os.path.join(DATA, "examples"))
    seen = np.uint16(0)
    cells = set()
    for lv in levels:
        seen |= np.bitwise_or.reduce(lv["board"].ravel())
        cells.update(np.unique(lv["board"] & ~np.uint16(C.COLORS)).tolist())
    for bit in (C.ALIVE, C.AGENT, C.PUSHABLE, C.PULLABLE, C.DESTRUCTIBLE,
                C.FROZEN, C.PRESERVING, C.INHIBITING, C.SPAWNING, C.EXIT,
                C.COLOR_R, C.COLOR_G, C.COLOR_B):
        assert seen & bit, f"no example exercises bit {bit:#x}"
    for t in (C.LIFE, C.HARD_LIFE, C.TREE, C.SPAWNER, C.WALL, C.CRATE,
              C.WEED, C.FOUNTAIN, C.PARASITE, C.PLANT, C.ICE_CUBE,
              C.LEVEL_EXIT):
        assert t in cells, f"no example contains cell type {t:#x}"
