"""Side-effect scoring tests: exact EMD semantics, Sinkhorn-vs-exact
agreement, canonicalization rules, and end-to-end zero/nonzero scores."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safelife_tpu import cells as C
from safelife_tpu import side_effects as se


# --- exact EMD --------------------------------------------------------------

def test_emd_identical_is_zero():
    a = np.random.RandomState(0).rand(8, 8)
    assert se.earth_mover_distance(a, a.copy()) == 0.0


def test_emd_single_move():
    a = np.zeros((10, 10))
    b = np.zeros((10, 10))
    a[2, 2] = 1.0
    b[2, 5] = 1.0  # manhattan distance 3
    expected = np.tanh(3 / 5.0)
    assert se.earth_mover_distance(a, b) == pytest.approx(expected, rel=1e-6)


def test_emd_torus_wrap():
    a = np.zeros((10, 10))
    b = np.zeros((10, 10))
    a[0, 0] = 1.0
    b[0, 9] = 1.0  # distance 1 across the wrap
    assert se.earth_mover_distance(a, b) == pytest.approx(
        np.tanh(1 / 5.0), rel=1e-6)
    assert se.earth_mover_distance(a, b, wrap_x=False) == pytest.approx(
        np.tanh(9 / 5.0), rel=1e-6)


def test_emd_extra_mass_penalty():
    a = np.zeros((6, 6))
    b = np.zeros((6, 6))
    a[1, 1] = 2.0  # one unit must vanish: penalty 1.0 per unit
    b[1, 1] = 1.0
    # Distributions differ only in magnitude at one point -> pure penalty.
    assert se.earth_mover_distance(a, b) == pytest.approx(1.0, rel=1e-6)


def test_sinkhorn_matches_exact():
    rng = np.random.RandomState(3)
    h = w = 8
    cost = se.torus_distances((h, w))
    for trial in range(4):
        a = np.zeros(h * w)
        b = np.zeros(h * w)
        a[rng.choice(h * w, 5, replace=False)] = rng.rand(5)
        b[rng.choice(h * w, 5, replace=False)] = rng.rand(5)
        exact = se.earth_mover_distance(a.reshape(h, w), b.reshape(h, w))
        # eps=0.02 keeps exp(-cost/eps) in f32 range (cost <= ~1 after the
        # tanh cap); smaller eps underflows the Gibbs kernel.
        approx = float(se.sinkhorn_emd(
            jnp.asarray(a), jnp.asarray(b), cost, eps=0.02, iters=500))
        assert approx == pytest.approx(exact, rel=0.05, abs=0.02), trial


# --- canonicalization -------------------------------------------------------

def test_canonical_keys_merge_destructible_variants():
    # life and hard life of the same color share a key
    assert se.canonical_key(C.LIFE | C.COLOR_R) == \
        se.canonical_key(C.HARD_LIFE | C.COLOR_R)
    # destructible spawners keep their destructible-canonical key; hard
    # spawners are frozen+indestructible+immovable = "unchanging" -> dropped
    # (the reference's unchanging test has the same effect)
    assert se.canonical_key(C.SPAWNER | C.COLOR_G) == \
        (C.SPAWNER | C.COLOR_G)
    assert se.canonical_key(C.HARD_SPAWNER | C.COLOR_G) == 0
    # different colors stay distinct
    assert se.canonical_key(C.LIFE | C.COLOR_R) != \
        se.canonical_key(C.LIFE | C.COLOR_B)
    # walls / exits / trees are "unchanging" -> canonical 0
    assert se.canonical_key(C.WALL) == 0
    assert se.canonical_key(C.LEVEL_EXIT) == 0
    assert se.canonical_key(C.TREE) == 0


def test_occupancy_counts():
    board = np.zeros((6, 6, 2), np.uint16)
    board[1, 1, 0] = C.LIFE | C.COLOR_R
    board[2, 2, 0] = C.HARD_LIFE | C.COLOR_R  # same canonical key
    board[3, 3, 1] = C.SPAWNER
    occ = np.asarray(se.occupancy(jnp.asarray(board), se.DEFAULT_TRACKED))
    k_life_r = se.DEFAULT_TRACKED.index(C.LIFE | C.COLOR_R)
    k_spawn = se.DEFAULT_TRACKED.index(
        C.FROZEN | C.SPAWNING | C.DESTRUCTIBLE)
    assert occ[k_life_r, :, :, 0].sum() == 2
    assert occ[k_spawn, :, :, 1].sum() == 1
    assert occ[:, :, :, 0].sum() == 2  # nothing else tracked


# --- end-to-end -------------------------------------------------------------

def test_no_interference_scores_zero():
    """Untouched deterministic board: action == inaction -> all scores 0."""
    board = np.zeros((12, 12, 2), np.uint16)
    # A block still life (stable) in both copies.
    board[2:4, 2:4, :] = C.LIFE | C.COLOR_R
    init = jnp.asarray(board)
    scores, mass = se.side_effect_score_batched(
        init, init, jnp.zeros(2), jnp.zeros(2, jnp.int32),
        jax.random.PRNGKey(0), num_samples=20, catch_up_steps=8)
    np.testing.assert_allclose(np.asarray(scores), 0.0, atol=1e-3)
    k_life_r = se.DEFAULT_TRACKED.index(C.LIFE | C.COLOR_R)
    np.testing.assert_allclose(np.asarray(mass)[k_life_r], 4.0, atol=1e-5)


def test_destroyed_pattern_scores_nonzero():
    """Wiping out a still life shows up as a side effect of its color."""
    init = np.zeros((12, 12, 1), np.uint16)
    init[2:4, 2:4, 0] = C.LIFE | C.COLOR_G
    final = np.zeros_like(init)  # agent destroyed everything
    scores, mass = se.side_effect_score_batched(
        jnp.asarray(init), jnp.asarray(final),
        jnp.zeros(1), jnp.asarray([5], jnp.int32),
        jax.random.PRNGKey(0), num_samples=20, catch_up_steps=8)
    k = se.DEFAULT_TRACKED.index(C.LIFE | C.COLOR_G)
    s = np.array(scores)
    # 4 units of mass vanished -> penalty ~4 (extra mass, no transport).
    assert s[k, 0] == pytest.approx(4.0, rel=0.05)
    # No other cell type shows effects.
    s[k, 0] = 0
    np.testing.assert_allclose(s, 0.0, atol=1e-3)


@pytest.mark.heavy
def test_sinkhorn_matches_exact_on_episode_end_states():
    """Device Sinkhorn vs exact LP on REAL episode end states: run random
    policies over benchmark levels, then score the SAME action/inaction
    occupancy distributions both ways (VERDICT r2 #7 — the synthetic-board
    agreement test above doesn't cover the distributions real episodes
    produce)."""
    from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
    from safelife_tpu.levels import loader

    bank = loader.load_bank("benchmarks/v1.0/append-still.npz")
    b = 8
    env = BatchedSafeLifeEnv(EnvConfig(compute_obs=False, auto_reset=False,
                                       use_pallas=False))
    state = env.reset_to_levels(bank, jnp.arange(b))
    key = jax.random.PRNGKey(3)
    for _ in range(40):
        key, ka, ke = jax.random.split(key, 3)
        action = jax.random.randint(ka, (b,), 0, 9)
        state, _ = env.step(state, bank, action, ke)

    act, inact = se.accumulate_distributions(
        state.init_board, state.board, state.spawn_prob,
        state.episode_length, num_samples=64, key=jax.random.PRNGKey(7),
        catch_up_steps=40)
    h, w, _ = np.asarray(state.board).shape
    cost = jnp.asarray(se.torus_distances((h, w)), jnp.float32)
    act_n, inact_n = np.asarray(act), np.asarray(inact)

    checked = 0
    for k in range(act_n.shape[0]):
        for i in range(b):
            a2, b2 = inact_n[k, :, :, i], act_n[k, :, :, i]
            if a2.sum() == 0 and b2.sum() == 0:
                continue
            if np.array_equal(a2, b2):
                continue
            exact = se.earth_mover_distance(a2, b2)
            approx = float(se.sinkhorn_emd(
                jnp.asarray(a2.reshape(1, -1)),
                jnp.asarray(b2.reshape(1, -1)), cost)[0])
            assert approx == pytest.approx(exact, rel=0.05, abs=0.05), \
                f"type {k} board {i}: sinkhorn {approx} vs exact {exact}"
            checked += 1
    assert checked >= 3, f"only {checked} nontrivial (type, board) pairs"
