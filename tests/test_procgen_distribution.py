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
