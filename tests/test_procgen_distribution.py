"""Statistical validation of the procgen level distribution (VERDICT #5).

The reference's levels ARE its distribution: the shipped frozen benchmark
archives (snapshotted under ``tests/golden/levels``) were produced by the
reference pipeline (``proc_gen.py:474-594`` + ``gen_board.c:386-496``)
from the very YAML parameters our presets mirror.  Generating fresh
ensembles through OUR pipeline (rewritten partitioning/painting + the
restructured C++ annealer) and comparing summary statistics against the
reference archives bounds any distribution drift.

Statistics compared per suite: live-cell count, wall/tree/spawner counts,
goal-cell mass, achievable score (perf_possible), and the fraction of
boards that actually oscillate.  Gates are z-tests on the ensemble means
(5 sigma of the combined standard error) plus loose relative bounds — wide
enough for sampling noise across 60-vs-100 level ensembles, tight enough
to catch a broken layer (e.g. fences not building, colors dropped,
period-2 layers never converging).
"""

import numpy as np
import pytest

from safelife_tpu import cells as C
from safelife_tpu.levels import loader
from safelife_tpu.ops import life_numpy, scoring
from safelife_tpu.procgen import gen_levels

N_GEN = 60  # fresh levels per suite (reference archives hold 100)


def level_stats(board, goals, min_perf):
    base = board & ~np.uint16(C.COLORS)
    alive = (board & C.ALIVE) != 0
    stats = dict(
        alive=alive.sum(),
        walls=((base & ~np.uint16(C.MOVABLE)) == C.WALL).sum(),
        trees=((base & ~np.uint16(C.MOVABLE)) == C.TREE).sum(),
        spawners=((board & C.SPAWNING) != 0).sum(),
        goal_cells=((goals & C.COLORS) != 0).sum(),
        blue_goals=((goals & C.COLORS) == C.COLOR_B).sum(),
        red_life=(alive & ((board & C.COLOR_R) != 0)).sum(),
        # Achievable score relative to the level's own baseline — exactly
        # what the bank precomputes as possible0.
        possible=(scoring.possible_score_np(goals[None])[0]
                  - scoring.performance_score_np(board[None], goals[None])[0]),
        min_perf=min_perf,
    )
    # Does the (spawn-free) board evolve?  Dynamic suites should move.
    b1 = life_numpy.advance_board_reference(board, 0.0)
    stats["oscillates"] = float((b1 != board).any())
    return stats


def ensemble_stats(levels):
    rows = [level_stats(lv["board"], lv["goals"],
                        float(lv["min_performance"])) for lv in levels]
    keys = rows[0].keys()
    return {k: np.array([float(r[k]) for r in rows]) for k in keys}


def compare(ref, gen, suite):
    for key in ref:
        r, g = ref[key], gen[key]
        se = np.sqrt(r.var() / len(r) + g.var() / len(g)) + 1e-9
        z = abs(r.mean() - g.mean()) / se
        # 5-sigma z-gate OR a generous relative band: catches structural
        # breakage, tolerates honest sampling noise.
        rel = abs(r.mean() - g.mean()) / (abs(r.mean()) + 1.0)
        assert z < 5.0 or rel < 0.35, (
            f"{suite}/{key}: reference {r.mean():.2f}±{r.std():.2f} vs "
            f"generated {g.mean():.2f}±{g.std():.2f} (z={z:.1f}, "
            f"rel={rel:.2f})")


SUITES = ["append-still", "prune-spawn", "prune-dynamic"]


def _still_life_stats(boards):
    """Structural statistics of a still-life ensemble: fill, live-neighbor
    histogram (still lifes live on 2s and 3s), connected components."""
    from scipy import ndimage

    rows = []
    for board in boards:
        alive = (np.asarray(board) & C.ALIVE) != 0
        n = sum(np.roll(alive, (di, dj), (0, 1))
                for di in (-1, 0, 1) for dj in (-1, 0, 1) if di or dj)
        live_n = n[alive]
        n_comp = ndimage.label(
            alive, structure=np.ones((3, 3)))[1] if alive.any() else 0
        rows.append(dict(
            fill=alive.mean(),
            mean_neighbors=live_n.mean() if len(live_n) else 0.0,
            frac_n2=(live_n == 2).mean() if len(live_n) else 0.0,
            frac_n3=(live_n == 3).mean() if len(live_n) else 0.0,
            components=n_comp,
        ))
    return {k: np.array([r[k] for r in rows]) for k in rows[0]}


def test_device_annealer_matches_native_ensemble():
    """VERDICT #5 tail: the on-device batched annealer's proposal scoring
    is distribution-identical to the C++ annealer's (the reference's
    "cumulative" type-cycle deltas telescope to the independent deltas
    scored here — procgen/batched.py docstring); both anneal still lifes
    on the same mask and the structural ensembles must agree within
    z/relative gates."""
    import jax
    import jax.numpy as jnp

    from safelife_tpu.procgen import native
    from safelife_tpu.procgen.batched import gen_still_lifes

    h = w = 16
    n = 48
    mask = np.zeros((h, w), bool)
    mask[3:13, 3:13] = True

    # Native (C++) ensemble.
    gen_mask = np.where(mask, native.NEW_CELL_MASK | native.CAN_OSCILLATE_MASK
                        | native.INCLUDE_VIOLATIONS_MASK, 0)
    halo = np.zeros_like(gen_mask)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            halo |= np.roll(gen_mask & 1, (di, dj), (0, 1))
    gen_mask = np.where((halo > 0) & (gen_mask == 0),
                        native.INCLUDE_VIOLATIONS_MASK, gen_mask)
    native_boards = []
    empty = np.zeros((h, w), np.uint16)
    for seed in range(n):
        try:
            native_boards.append(native.gen_pattern(
                empty, gen_mask.astype(np.int32), period=1,
                min_fill=0.15, temperature=0.45, rng=seed))
        except native.BoardGenException:
            pass
    assert len(native_boards) >= 0.8 * n

    # On-device ensemble (same mask / fill / temperature).
    boards, conv = gen_still_lifes(
        jax.random.PRNGKey(0), jnp.asarray(mask), batch=n,
        iters=2000, min_fill=0.15, temperature=0.45)
    boards = np.asarray(boards)
    conv = np.asarray(conv)
    assert conv.mean() >= 0.8
    device_boards = [boards[..., b] for b in range(n) if conv[b]]

    ref = _still_life_stats(native_boards)
    got = _still_life_stats(device_boards)
    compare(ref, got, "still-life-annealers")


@pytest.mark.parametrize("suite", SUITES)
def test_generated_distribution_matches_reference_archive(suite):
    ref_levels = loader.load_levels(f"benchmarks/v1.0/{suite}")
    np.random.seed(123 + SUITES.index(suite))
    gen = gen_levels(suite, num_levels=N_GEN)
    ref = ensemble_stats(ref_levels)
    got = ensemble_stats(gen)
    compare(ref, got, suite)
    # Structural invariants of the task family:
    if suite.endswith("spawn"):
        assert np.mean(got["spawners"] > 0) > 0.5, "spawn task needs spawners"
    if "dynamic" in suite:
        assert got["oscillates"].mean() > 0.5, "dynamic task must move"
    if suite.startswith("append"):
        assert (got["blue_goals"] > 0).mean() > 0.9, "append needs blue goals"
    if suite.startswith("prune"):
        assert (got["red_life"] > 0).mean() > 0.9, "prune needs red life"
    assert (got["possible"] > 0).all(), "every level must have work to do"


@pytest.mark.parametrize("task", ["append-still", "prune-still",
                                  "append-dynamic", "prune-dynamic",
                                  "prune-still-hard", "append-spawn",
                                  "prune-spawn", "navigation",
                                  "append-still-easy", "prune-still-easy"])
@pytest.mark.heavy
def test_partitioned_factory_matches_reference_archive(task):
    """The fully-batched multi-region factory (host partition scaffolds +
    on-device layered annealing, procgen/batched.gen_partitioned_levels)
    emits levels from the REAL task distribution: ensemble statistics
    must match the reference archives like the host pipeline's do
    (VERDICT r2 #5), for every trainable task family.  The easy
    curriculum variants have no frozen archive; they gate against the
    host pipeline's ensemble (itself archive-gated) instead."""
    from safelife_tpu.procgen.batched import gen_partitioned_levels

    n = 16
    bank, conv = gen_partitioned_levels(task, num_levels=n, seed=5,
                                        iters=1500)
    conv = np.asarray(conv)
    assert conv.mean() >= 0.5, f"only {conv.mean():.2f} converged"
    board = np.asarray(bank.board)
    goals = np.asarray(bank.goals)
    mp = np.asarray(bank.min_performance)
    gen = [dict(board=board[..., i], goals=goals[..., i],
                min_performance=float(mp[i]))
           for i in range(n) if conv[i]]

    if task.endswith("-easy"):
        np.random.seed(77)
        ref_levels = gen_levels(task, num_levels=24)
    else:
        ref_levels = loader.load_levels(f"benchmarks/v1.0/{task}")
    got = ensemble_stats(gen)
    compare(ensemble_stats(ref_levels), got, f"factory/{task}")
    if "dynamic" in task or task == "navigation":
        assert got["oscillates"].mean() > 0.5, "dynamic boards must move"
        assert not bank.static_goals and bank.simple_goals
    else:
        assert bank.static_goals
    if task.endswith("spawn") or task == "navigation":
        assert (got["spawners"] > 0).all(), "every level needs a spawner"
        assert not bank.spawnless
        assert np.allclose(np.asarray(bank.spawn_prob)[conv], 0.3)
    else:
        assert bank.spawnless
    if task in ("prune-still-hard", "prune-dynamic"):
        # The medium-vs-hard region choice: some red life is hardened
        # (DESTRUCTIBLE stripped), some not (reference 'prune hard'
        # hardened_life=1 on half the region draws).
        red = ((board & C.COLOR_R) != 0) & ((board & C.ALIVE) != 0) \
            & ((board & C.COLOR_G) == 0)
        hard = red & ((board & C.DESTRUCTIBLE) == 0)
        assert hard[..., conv].any(), "hard variant must harden red life"
        assert (red & ~hard)[..., conv].any(), "medium variant must not"
