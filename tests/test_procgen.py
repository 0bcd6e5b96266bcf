"""Procedural generation tests: native annealer validity, partitioning
invariants, fences, stability masks, and end-to-end game generation."""

import numpy as np
import pytest
from scipy import ndimage

from safelife_tpu import cells as C
from safelife_tpu.ops import life_numpy
from safelife_tpu.procgen import (
    gen_bank, gen_game_from_file, make_partitioned_regions, native,
    stability_mask)
from safelife_tpu.procgen.generate import build_fence, fix_random_values

pytestmark = pytest.mark.heavy

FULL = (native.NEW_CELL_MASK | native.CAN_OSCILLATE_MASK
        | native.INCLUDE_VIOLATIONS_MASK)


def region_mask(h, w, pad=3):
    mask = np.zeros((h, w), np.int32)
    mask[pad:h - pad, pad:w - pad] = FULL
    border = ndimage.maximum_filter(mask > 0, size=3) & (mask == 0)
    mask[border] = native.INCLUDE_VIOLATIONS_MASK
    return mask


def test_native_still_life_is_stable():
    board = np.zeros((16, 16), np.uint16)
    mask = region_mask(16, 16)
    out = native.gen_pattern(board, mask, period=1, min_fill=0.2, rng=11)
    assert (out != 0).sum() >= 0.2 * (mask & 1).sum() * 0.9
    adv = life_numpy.advance_board_reference(out, 0.0)
    np.testing.assert_array_equal(adv, out)


def test_native_oscillator_cycles():
    board = np.zeros((16, 16), np.uint16)
    mask = region_mask(16, 16)
    out = native.gen_pattern(board, mask, period=2, min_fill=0.15,
                             temperature=0.7, osc_bonus=0.5, rng=5)
    a1 = life_numpy.advance_board_reference(out, 0.0)
    a2 = life_numpy.advance_board_reference(a1, 0.0)
    np.testing.assert_array_equal(a2, out)   # period 2
    assert (a1 != out).any()                 # actually oscillates


def test_native_respects_mask():
    board = np.zeros((16, 16), np.uint16)
    mask = region_mask(16, 16)
    out = native.gen_pattern(board, mask, period=1, min_fill=0.2, rng=3)
    assert (out[(mask & native.NEW_CELL_MASK) == 0] == 0).all()


def test_wrapped_label_matches_scipy_interior():
    rng = np.random.RandomState(0)
    data = (rng.rand(12, 12) < 0.3).astype(np.int32)
    data[0, :] = data[-1, :] = data[:, 0] = data[:, -1] = 0  # no wrap needed
    labels, n = native.wrapped_label(data)
    s = ndimage.generate_binary_structure(2, 2)  # 8-connectivity
    ref_labels, ref_n = ndimage.label(data, structure=s)
    assert n == ref_n
    # label values may differ; compare partition structure
    for k in range(1, n + 1):
        region = labels == k
        ref_vals = set(ref_labels[region].tolist())
        assert len(ref_vals) == 1


def test_partitioning_invariants():
    np.random.seed(7)
    regions = make_partitioned_regions((20, 20), max_regions=4,
                                       min_regions=2)
    ids = [k for k in np.unique(regions) if k > 0]
    assert 2 <= len(ids) <= 4
    for a in ids:
        grow = ndimage.maximum_filter(regions == a, size=3, mode="wrap")
        for b in ids:
            if a != b:
                assert not (grow & (regions == b)).any()


def test_build_fence_contains_region():
    np.random.seed(1)
    mask = np.zeros((14, 14), np.int32)
    mask[4:10, 4:10] = 1
    fence = build_fence(mask)
    # fences sit on the region's own edge cells, never its interior
    interior = ndimage.minimum_filter(mask > 0, size=3)
    assert (fence[interior] == 0).all()
    assert (fence[mask == 0] == 0).all()
    assert fence.sum() > 0


def test_fix_random_values():
    np.random.seed(0)
    assert fix_random_values(5) == 5
    v = fix_random_values({"uniform": [2.0, 3.0]})
    assert 2.0 <= v <= 3.0
    c = fix_random_values({"choices": ["a", "b"]})
    assert c in ("a", "b")
    nested = fix_random_values({"x": {"uniform": [0, 1]}, "y": 3})
    assert 0 <= nested["x"] <= 1 and nested["y"] == 3


@pytest.mark.parametrize("task", ["append-still", "prune-still",
                                  "append-spawn"])
def test_gen_game_end_to_end(task):
    game = gen_game_from_file(task, seed=hash(task) % 2**31)
    assert (game.board & C.AGENT).any()
    assert (game.board & C.EXIT).any()
    assert (game.goals != 0).any()
    ar, ac = game.agent_loc[1], game.agent_loc[0]
    assert game.board[ar, ac] & C.AGENT
    comp, poss = game.performance_ratio()
    assert poss > 0  # there is something to do


def test_gen_bank_feeds_env():
    import jax
    import jax.numpy as jnp
    from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig

    bank = gen_bank("append-still-easy", num_levels=3, seed=42)
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(15, 15)))
    state = env.reset_all(bank, 4, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(5):
        key, ka, ke = jax.random.split(key, 3)
        a = jax.random.randint(ka, (4,), 0, 9)
        state, ts = env.step(state, bank, a, ke)
    assert np.isfinite(np.asarray(ts.reward)).all()


def test_stability_mask_marks_still_life():
    board = np.zeros((14, 14), np.uint16)
    board[2:4, 2:4] = C.LIFE          # block: stable
    board[8, 6:9] = C.LIFE            # blinker: period 2
    mask = stability_mask(board, period=2)
    assert mask[2:4, 2:4].all()
    assert mask[7:10, 5:10].any()     # blinker region is period-2 stable
    mask1 = stability_mask(board, period=1)
    assert mask1[2:4, 2:4].all()


def test_batched_annealer_generates_still_lifes():
    """The on-device batched annealer produces valid still lifes in the
    masked region for a whole batch at once."""
    import jax
    import jax.numpy as jnp
    from safelife_tpu.procgen.batched import gen_still_lifes

    h = w = 16
    mask = np.zeros((h, w), bool)
    mask[3:13, 3:13] = True
    boards, converged = gen_still_lifes(
        jax.random.PRNGKey(0), jnp.asarray(mask), batch=32,
        iters=1500, min_fill=0.15)
    boards = np.asarray(boards)
    conv = np.asarray(converged)
    assert conv.mean() >= 0.8, f"only {conv.mean():.0%} converged"
    area = mask.sum()
    for b in range(32):
        if not conv[b]:
            continue
        board = boards[..., b]
        # nothing outside the mask
        assert (board[~mask] == 0).all()
        # min fill respected
        assert (board != 0).sum() >= 0.15 * area
        # genuine still life
        adv = life_numpy.advance_board_reference(board, 0.0)
        np.testing.assert_array_equal(adv, board, err_msg=f"board {b}")


def test_on_device_level_factory():
    """gen_build_levels produces playable build-task banks on device."""
    import jax
    import jax.numpy as jnp
    from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
    from safelife_tpu.procgen.batched import gen_build_levels

    bank, conv = gen_build_levels(jax.random.PRNGKey(0), batch=16,
                                  iters=1200)
    conv = np.asarray(conv)
    assert conv.mean() >= 0.7
    board = np.asarray(bank.board)
    assert ((board & C.AGENT) != 0).sum(axis=(0, 1)).min() == 1  # one agent
    assert ((board & C.EXIT) != 0).sum(axis=(0, 1)).min() == 1   # one exit
    goals = np.asarray(bank.goals)
    assert (((goals & C.ALIVE) != 0) & ((goals & C.COLOR_B) != 0)).any()
    assert (np.asarray(bank.possible0) > 0).all()  # something to build

    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(15, 15), time_limit=20))
    state = env.reset_all(bank, 8, jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(2)
    for _ in range(25):
        key, ka, ke = jax.random.split(key, 3)
        a = jax.random.randint(ka, (8,), 0, 9)
        state, ts = env.step(state, bank, a, ke)
    assert np.isfinite(np.asarray(ts.reward)).all()
    # a green still life that the agent hasn't touched stays intact
    conv_idx = int(np.argmax(conv))
    b0 = board[..., conv_idx]
    from safelife_tpu.ops import life_numpy
    interior = np.zeros_like(b0, bool); interior[3:-3, 3:-3] = True
    adv = life_numpy.advance_board_reference(b0, 0.0)
    np.testing.assert_array_equal(adv[interior], b0[interior])


def test_batched_annealer_oscillators():
    """period=2 batched annealing yields true period-2 oscillators."""
    import jax
    import jax.numpy as jnp
    from safelife_tpu.procgen.batched import gen_still_lifes

    h = w = 16
    mask = np.zeros((h, w), bool)
    mask[3:13, 3:13] = True
    boards, conv = gen_still_lifes(
        jax.random.PRNGKey(2), jnp.asarray(mask), batch=16,
        iters=2500, min_fill=0.1, period=2, temperature=0.7, osc_bonus=0.5)
    boards = np.asarray(boards)
    conv = np.asarray(conv)
    assert conv.mean() >= 0.5, f"only {conv.mean():.0%} converged"
    oscillating = 0
    for b in range(16):
        if not conv[b]:
            continue
        board = boards[..., b]
        a1 = life_numpy.advance_board_reference(board, 0.0)
        a2 = life_numpy.advance_board_reference(a1, 0.0)
        np.testing.assert_array_equal(a2, board, err_msg=f"board {b}")
        oscillating += int((a1 != board).any())
    assert oscillating >= 1, "no board actually oscillates"


def test_on_device_factory_prune_and_spawn():
    import jax
    from safelife_tpu.procgen.batched import gen_build_levels

    bank_p, conv_p = gen_build_levels(jax.random.PRNGKey(3), batch=8,
                                      iters=1500, task="prune")
    assert np.asarray(conv_p).mean() >= 0.5
    board = np.asarray(bank_p.board)
    red_life = ((board & C.ALIVE) != 0) & ((board & C.COLOR_R) != 0)
    green_life = ((board & C.ALIVE) != 0) & ((board & C.COLOR_G) != 0)
    assert red_life.any() and green_life.any()
    # removing red improves performance: baseline negative contribution
    assert (np.asarray(bank_p.possible0) > 0).all()

    bank_s, conv_s = gen_build_levels(jax.random.PRNGKey(4), batch=8,
                                      iters=1200, task="append-spawn")
    board = np.asarray(bank_s.board)
    assert ((board & C.SPAWNING) != 0).sum(axis=(0, 1)).min() == 1
    assert (np.asarray(bank_s.spawn_prob) == np.float32(0.3)).all()
