"""Correctness tests for the fused Pallas fast path (the TPU kernels).

These run the real kernel bodies (``life_pallas._advance_block``,
``env_step_pallas._action_kernel`` / ``_advance_kernel``) on CPU via
Pallas's TPU interpret mode (``pltpu.InterpretParams`` emulates the
in-core PRNG and ``pltpu.roll``), asserting bit-equality with the XLA
path — which is itself golden-tested against the reference C engine
(``speedups_src/advance_board.c``, ``safelife_game.py:294-393``).

Covers: the CA rule block with injected spawn fields (all cell-type
interactions), the fused two-board advance, the full fused env-step core
(action + advance + scoring + exit recolor + side-effect count), the
folded auto-reset branch (``time_limit > 0``), in-core PRNG spawn
statistics/determinism, and end-to-end env.step equivalence on a real
benchmark bank including auto-resets.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import safelife_tpu.cells as C
from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig, _recolor_exits
from safelife_tpu.env.wrappers import SideEffectPenaltyWrapper
from safelife_tpu.levels import loader
from safelife_tpu.ops import agent as agent_ops
from safelife_tpu.ops import env_step_pallas, life, life_pallas, scoring

INTERP = life_pallas.interpret_params()
B = life_pallas.LANES  # smallest lane-aligned batch

_FLAGS = np.array(
    [C.ALIVE, C.AGENT, C.PUSHABLE, C.DESTRUCTIBLE, C.FROZEN,
     C.PRESERVING, C.INHIBITING, C.SPAWNING, C.EXIT,
     C.COLOR_R, C.COLOR_G, C.COLOR_B, C.PULLABLE], dtype=np.uint16)


def rich_soup(rng, shape, density=0.15):
    """Random boards exercising every cell flag (incl. exotic combos)."""
    board = np.zeros(shape, np.uint16)
    for f in _FLAGS:
        board |= f * (rng.random(shape) < density).astype(np.uint16)
    return board


def _bench_boards(n):
    """Real benchmark boards+goals tiled up to n lanes."""
    levels = (loader.load_levels("benchmarks/v1.0/append-still")[:8]
              + loader.load_levels("benchmarks/v1.0/prune-spawn")[:8])
    boards = np.stack([lv["board"] for lv in levels], axis=-1)
    goals = np.stack([lv["goals"] for lv in levels], axis=-1)
    reps = -(-n // boards.shape[-1])
    return (np.tile(boards, (1, 1, reps))[..., :n],
            np.tile(goals, (1, 1, reps))[..., :n])


# ---------------------------------------------------------------------------
# 1. The CA rule block, bit-exact with injected randomness.
# ---------------------------------------------------------------------------

def test_advance_block_matches_xla_on_soups():
    rng = np.random.RandomState(11)
    for trial in range(4):
        board = rich_soup(rng, (26, 26, B))
        spawn = rng.random(board.shape) < 0.4
        got = life_pallas.advance_with_field(
            jnp.asarray(board), jnp.asarray(spawn), interpret=INTERP)
        want = life.advance_board(jnp.asarray(board), jnp.asarray(spawn))
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(want), err_msg=f"trial {trial}")


def test_advance_block_matches_xla_on_benchmark_levels():
    boards, goals = _bench_boards(B)
    rng = np.random.RandomState(5)
    b, g = jnp.asarray(boards), jnp.asarray(goals)
    for t in range(8):
        spawn = jnp.asarray(rng.random(boards.shape) < 0.3)
        b2 = life_pallas.advance_with_field(b, spawn, interpret=INTERP)
        np.testing.assert_array_equal(
            np.asarray(b2), np.asarray(life.advance_board(b, spawn)),
            err_msg=f"board step {t}")
        g2 = life_pallas.advance_with_field(g, spawn, interpret=INTERP)
        np.testing.assert_array_equal(
            np.asarray(g2), np.asarray(life.advance_board(g, spawn)),
            err_msg=f"goals step {t}")
        b, g = b2, g2


def _simple_goal_soup(rng, shape, density=0.2):
    """Random boards satisfying the LevelBank.simple_goals invariants:
    no PRESERVING/INHIBITING/SPAWNING/EXIT bits.  Walls, crates, trees,
    hard (indestructible) life and colors are all allowed."""
    board = np.zeros(shape, np.uint16)
    allowed = (C.ALIVE, C.DESTRUCTIBLE, C.FROZEN, C.PUSHABLE, C.PULLABLE,
               C.COLOR_R, C.COLOR_G, C.COLOR_B)
    for f in allowed:
        board |= np.uint16(f) * (rng.random(shape) < density).astype(
            np.uint16)
    return board


def test_advance_goals_simple_matches_full_rule():
    """The collapsed simple-goals rule is bit-exact vs the general rule
    (and its invariants are inductive: re-certify after every step)."""
    rng = np.random.RandomState(77)
    forbidden = np.uint16(C.PRESERVING | C.INHIBITING | C.SPAWNING | C.EXIT)
    g = jnp.asarray(_simple_goal_soup(rng, (26, 26, B)))
    no_spawn = jnp.zeros(g.shape, bool)
    for t in range(6):
        got = life_pallas.advance_simple(g, interpret=INTERP)
        want = life.advance_board(g, no_spawn)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"step {t}")
        assert not (np.asarray(got) & forbidden).any()
        g = got


def test_fused_step_simple_goals_flag():
    """fused_step(simple_goals=True) equals the full dynamic-goals path
    when the goal boards are certified simple."""
    rng = np.random.RandomState(91)
    (board, goals, init_board, action, ar, ac, orient,
     game_over, ce0, baseline, min_perf) = _random_step_inputs(rng)
    goals = _simple_goal_soup(rng, goals.shape)
    zero_p = np.zeros(B, np.float32)
    args = (jnp.asarray(board), jnp.asarray(goals), jnp.asarray(init_board),
            jnp.asarray(action), jnp.asarray(ar), jnp.asarray(ac),
            jnp.asarray(orient), jnp.asarray(game_over), jnp.asarray(ce0),
            jnp.asarray(baseline), jnp.asarray(zero_p),
            jnp.asarray(min_perf))
    full = env_step_pallas.fused_step(*args, seed=7, interpret=INTERP)
    simple = env_step_pallas.fused_step(*args, seed=7, interpret=INTERP,
                                        simple_goals=True)
    for i, (a, b) in enumerate(zip(full, simple)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"output {i}")


def _spawnless_soup(rng, shape, density=0.15):
    """Random boards with every flag EXCEPT spawning (the bank-wide
    ``spawnless`` certification forbids spawners anywhere)."""
    board = np.zeros(shape, np.uint16)
    for f in _FLAGS:
        if f == C.SPAWNING:
            continue
        board |= f * (rng.random(shape) < density).astype(np.uint16)
    return board


def test_advance_spawnless_matches_xla():
    """The single-stencil 4-bit-field packing (the headline *-still board
    advance) is bit-exact vs the XLA rule on spawner-free soups."""
    rng = np.random.RandomState(41)
    no_spawn = jnp.zeros((26, 26, B), bool)
    b = jnp.asarray(_spawnless_soup(rng, (26, 26, B)))
    for t in range(6):
        got = life_pallas.advance_spawnless(b, interpret=INTERP)
        want = life.advance_board(b, no_spawn)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"step {t}")
        b = got


def _spawn_simple_goal_soup(rng, shape, density=0.2):
    """Random boards satisfying LevelBank.spawn_simple_goals: no
    PRESERVING/INHIBITING/EXIT bits; SPAWNING allowed (incl. exotic
    alive+spawning combos that stress the doubled color weights)."""
    board = np.zeros(shape, np.uint16)
    allowed = (C.ALIVE, C.DESTRUCTIBLE, C.FROZEN, C.PUSHABLE, C.PULLABLE,
               C.SPAWNING, C.COLOR_R, C.COLOR_G, C.COLOR_B)
    for f in allowed:
        board |= np.uint16(f) * (rng.random(shape) < density).astype(
            np.uint16)
    return board


def test_advance_pair_spawnsimple_matches_xla():
    """The two-stencil spawn-simple pair advance (full-rule board +
    goal board with spawners but no PRESERVING/INHIBITING/EXIT — the
    goal-spawner stress path) is bit-exact vs the XLA rule per board,
    and its goal certification is inductive."""
    rng = np.random.RandomState(55)
    forbidden = np.uint16(C.PRESERVING | C.INHIBITING | C.EXIT)
    b = jnp.asarray(rich_soup(rng, (26, 26, B)))
    g = jnp.asarray(_spawn_simple_goal_soup(rng, (26, 26, B)))
    for t in range(6):
        sb = jnp.asarray(rng.random(b.shape) < 0.35)
        sg = jnp.asarray(rng.random(b.shape) < 0.35)
        got_b, got_g = life_pallas.advance_pair_spawnsimple_with_fields(
            b, sb, g, sg, interpret=INTERP)
        np.testing.assert_array_equal(
            np.asarray(got_b), np.asarray(life.advance_board(b, sb)),
            err_msg=f"board step {t}")
        np.testing.assert_array_equal(
            np.asarray(got_g), np.asarray(life.advance_board(g, sg)),
            err_msg=f"goals step {t}")
        assert not (np.asarray(got_g) & forbidden).any()
        b, g = got_b, got_g


def test_fused_step_spawn_simple_goals_flag():
    """fused_step(spawn_simple_goals=True) equals the general dynamic-
    goals path when the goal boards are certified spawn-simple."""
    rng = np.random.RandomState(93)
    (board, goals, init_board, action, ar, ac, orient,
     game_over, ce0, baseline, min_perf) = _random_step_inputs(rng)
    goals = _spawn_simple_goal_soup(rng, goals.shape)
    zero_p = np.zeros(B, np.float32)
    args = (jnp.asarray(board), jnp.asarray(goals), jnp.asarray(init_board),
            jnp.asarray(action), jnp.asarray(ar), jnp.asarray(ac),
            jnp.asarray(orient), jnp.asarray(game_over), jnp.asarray(ce0),
            jnp.asarray(baseline), jnp.asarray(zero_p),
            jnp.asarray(min_perf))
    full = env_step_pallas.fused_step(*args, seed=7, interpret=INTERP)
    fast = env_step_pallas.fused_step(*args, seed=7, interpret=INTERP,
                                      spawn_simple_goals=True)
    for i, (a, b) in enumerate(zip(full, fast)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"output {i}")


# ---------------------------------------------------------------------------
# 2. advance_both: fused two-board advance + in-core PRNG.
# ---------------------------------------------------------------------------

def test_advance_both_deterministic_path():
    boards, goals = _bench_boards(B)
    b, g = jnp.asarray(boards), jnp.asarray(goals)
    zero_p = jnp.zeros(B, jnp.float32)
    no_spawn = jnp.zeros(b.shape, bool)
    for t in range(6):
        b2, g2 = life_pallas.advance_both(b, g, zero_p, seed=t, interpret=INTERP)
        np.testing.assert_array_equal(
            np.asarray(b2), np.asarray(life.advance_board(b, no_spawn)))
        np.testing.assert_array_equal(
            np.asarray(g2), np.asarray(life.advance_board(g, no_spawn)))
        b, g = b2, g2


def _interpret_prng_is_zero():
    """jax 0.9 interpret mode stubs the in-core PRNG with all-zero bits;
    exploit that below (spawn fires at EVERY eligible cell when p > 0).
    Real-PRNG statistics/determinism run on hardware via bench.py
    --selftest.  If a future jax implements the PRNG in interpret mode,
    this returns False and the exploit tests skip."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(out_ref):
        pltpu.prng_seed(7)
        out_ref[:] = pltpu.bitcast(
            pltpu.prng_random_bits(out_ref.shape), jnp.int32)

    bits = pl.pallas_call(
        kern, out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=INTERP)()
    return not np.asarray(bits).any()


def test_advance_both_spawn_eligibility():
    """In interpret mode the PRNG yields zero bits, so ``u24 < thresh24``
    is True wherever spawn_prob > 0: the in-core spawn path must then
    match the XLA kernel fed an all-True spawn field (and the p == 0
    lanes must match an all-False field) — a deterministic CPU test of
    the threshold + eligibility logic."""
    if not _interpret_prng_is_zero():
        pytest.skip("interpret-mode PRNG is real here; covered on TPU")
    rng = np.random.RandomState(3)
    board = jnp.asarray(rich_soup(rng, (26, 26, B)))
    goals = jnp.asarray(rich_soup(rng, (26, 26, B)))
    p = np.where(np.arange(B) % 2 == 0, 0.7, 0.0).astype(np.float32)
    out_b, out_g = life_pallas.advance_both(
        board, goals, jnp.asarray(p), seed=42, interpret=INTERP)
    field = jnp.asarray(np.broadcast_to(p > 0, (26, 26, B)))
    np.testing.assert_array_equal(
        np.asarray(out_b), np.asarray(life.advance_board(board, field)))
    np.testing.assert_array_equal(
        np.asarray(out_g), np.asarray(life.advance_board(goals, field)))


# ---------------------------------------------------------------------------
# 3. The fused env-step core vs the XLA composition.
# ---------------------------------------------------------------------------

def _xla_step_core(board, goals, init_board, action, ar, ac, orient,
                   game_over, ce0, baseline, min_perf, static_goals):
    """The XLA branch of env.step, spawn-free (mirrors env/env.py)."""
    act = agent_ops.execute_action(
        board, ar, ac, orient, action, ce0, game_over)
    no_spawn = jnp.zeros(board.shape, bool)
    board1 = life.advance_board(act.board, no_spawn)
    goals1 = goals if static_goals else life.advance_board(goals, no_spawn)
    points = scoring.current_points(board1, goals1)
    comp, poss = scoring.performance_ratio(board1, goals1, baseline)
    ce1 = scoring.can_exit(comp, poss, min_perf)
    board1 = _recolor_exits(board1, init_board, ce1)
    effect = SideEffectPenaltyWrapper.side_effect_count(
        None, board1, init_board, goals1)
    return dict(board=board1, goals=goals1, agent_row=act.agent_row,
                agent_col=act.agent_col, orientation=act.orientation,
                exited=act.exited, points=points, comp=comp, poss=poss,
                ce1=ce1, effect=effect)


def _random_step_inputs(rng, h=26, w=26):
    board = rich_soup(rng, (h, w, B))
    goals = rich_soup(rng, (h, w, B), density=0.1)
    init_board = rich_soup(rng, (h, w, B))
    ar = rng.randint(0, h, B).astype(np.int32)
    ac = rng.randint(0, w, B).astype(np.int32)
    # Make the agent cell look like an agent on most lanes.
    board[ar, ac, np.arange(B)] = np.uint16(C.PLAYER | C.COLOR_R)
    action = rng.randint(0, 9, B).astype(np.int32)
    orient = rng.randint(0, 4, B).astype(np.int32)
    game_over = rng.random(B) < 0.1
    ce0 = rng.random(B) < 0.5
    baseline = rng.randint(-5, 6, B).astype(np.int32)
    min_perf = np.where(rng.random(B) < 0.3, -1.0,
                        rng.random(B)).astype(np.float32)
    return (board, goals, init_board, action, ar, ac, orient,
            game_over, ce0, baseline, min_perf)


@pytest.mark.parametrize("static_goals", [False, True])
def test_fused_step_matches_xla_composition(static_goals):
    rng = np.random.RandomState(21 + static_goals)
    (board, goals, init_board, action, ar, ac, orient,
     game_over, ce0, baseline, min_perf) = _random_step_inputs(rng)
    zero_p = np.zeros(B, np.float32)

    # With static goals the kernel no longer recomputes the (constant)
    # possible score; the caller supplies the live per-lane value.
    poss_in = (scoring.possible_score(jnp.asarray(goals))
               - jnp.asarray(baseline)) if static_goals else None
    out = env_step_pallas.fused_step(
        jnp.asarray(board), jnp.asarray(goals), jnp.asarray(init_board),
        jnp.asarray(action), jnp.asarray(ar), jnp.asarray(ac),
        jnp.asarray(orient), jnp.asarray(game_over), jnp.asarray(ce0),
        jnp.asarray(baseline), jnp.asarray(zero_p), jnp.asarray(min_perf),
        seed=7, interpret=INTERP, static_goals=static_goals,
        perf_possible=poss_in)
    (f_board, f_goals, f_ar, f_ac, f_or, f_exited,
     f_points, f_comp, f_poss, f_ce1, f_effect) = out

    want = _xla_step_core(
        jnp.asarray(board), jnp.asarray(goals), jnp.asarray(init_board),
        jnp.asarray(action), jnp.asarray(ar), jnp.asarray(ac),
        jnp.asarray(orient), jnp.asarray(game_over), jnp.asarray(ce0),
        jnp.asarray(baseline), jnp.asarray(min_perf), static_goals)

    np.testing.assert_array_equal(np.asarray(f_board), np.asarray(want["board"]))
    np.testing.assert_array_equal(np.asarray(f_goals), np.asarray(want["goals"]))
    np.testing.assert_array_equal(np.asarray(f_ar), np.asarray(want["agent_row"]))
    np.testing.assert_array_equal(np.asarray(f_ac), np.asarray(want["agent_col"]))
    np.testing.assert_array_equal(np.asarray(f_or), np.asarray(want["orientation"]))
    np.testing.assert_array_equal(np.asarray(f_exited), np.asarray(want["exited"]))
    np.testing.assert_array_equal(np.asarray(f_points), np.asarray(want["points"]))
    np.testing.assert_array_equal(np.asarray(f_comp), np.asarray(want["comp"]))
    np.testing.assert_array_equal(np.asarray(f_poss), np.asarray(want["poss"]))
    np.testing.assert_array_equal(np.asarray(f_ce1), np.asarray(want["ce1"]))
    np.testing.assert_array_equal(np.asarray(f_effect), np.asarray(want["effect"]))


def test_fused_autoreset_fold():
    """time_limit>0 folds the reset select into the kernel's write pass:
    outputs must equal the unfolded kernel + a host-side select."""
    rng = np.random.RandomState(33)
    (board, goals, init_board, action, ar, ac, orient,
     game_over, ce0, baseline, min_perf) = _random_step_inputs(rng)
    zero_p = np.zeros(B, np.float32)
    time_limit = 10
    # Straddle the limit: lengths 8..11 (post-step 9..12, done iff > 10).
    episode_length = rng.randint(8, 12, B).astype(np.int32)
    fresh = {k: jnp.asarray(rich_soup(rng, (26, 26, B)))
             for k in ("board", "goals", "init_board")}

    args = (jnp.asarray(board), jnp.asarray(goals), jnp.asarray(init_board),
            jnp.asarray(action), jnp.asarray(ar), jnp.asarray(ac),
            jnp.asarray(orient), jnp.asarray(game_over), jnp.asarray(ce0),
            jnp.asarray(baseline), jnp.asarray(zero_p), jnp.asarray(min_perf))

    base = env_step_pallas.fused_step(*args, seed=7, interpret=INTERP)
    folded = env_step_pallas.fused_step(
        *args, seed=7, interpret=INTERP,
        episode_length=jnp.asarray(episode_length),
        fresh=fresh, time_limit=time_limit)

    exited = np.asarray(base[5])
    done = ((episode_length + 1 > time_limit) | game_over | exited)
    m = done[None, None, :]

    def sel(new, old):
        return np.where(m, np.asarray(new), np.asarray(old))

    np.testing.assert_array_equal(np.asarray(folded[0]),
                                  sel(fresh["board"], base[0]))
    np.testing.assert_array_equal(np.asarray(folded[1]),
                                  sel(fresh["goals"], base[1]))
    np.testing.assert_array_equal(np.asarray(folded[11]),
                                  sel(fresh["init_board"], init_board))
    # Per-lane outputs (points/comp/poss/ce1/effect, agent) are pre-reset:
    for i in (2, 3, 4, 5, 6, 7, 8, 9, 10):
        np.testing.assert_array_equal(
            np.asarray(folded[i]), np.asarray(base[i]), err_msg=f"out {i}")


# ---------------------------------------------------------------------------
# 4. End-to-end: env.step on the fused path == env.step on the XLA path.
# ---------------------------------------------------------------------------

def _rollout(env, bank, actions, fresh_levels_seed=0):
    key = jax.random.key(123)
    state = env.reset_to_levels(
        bank, jnp.arange(B) % bank.num_levels)
    fresh = env.sample_fresh_levels(bank, B, jax.random.key(fresh_levels_seed))
    trace = []
    for t in range(actions.shape[0]):
        state, ts = env.step(state, bank, jnp.asarray(actions[t]), key,
                             fresh_levels=fresh)
        trace.append(jax.device_get(dict(
            board=state.board, goals=state.goals, reward=ts.reward,
            done=ts.done, agent_row=state.agent_row,
            agent_col=state.agent_col, orientation=state.orientation,
            game_over=state.game_over, points=state.points_last,
            comp=ts.perf_completed, poss=ts.perf_possible,
            episode_length=state.episode_length,
            level_idx=state.level_idx, obs=ts.obs,
            num_steps=state.num_steps,
            episodes_completed=state.episodes_completed)))
    return trace


@pytest.mark.parametrize("suite,view", [
    ("benchmarks/v1.0/append-still", (15, 15)),
    ("benchmarks/v1.0/prune-still", (15, 15)),
    # view > board exercises the in-kernel tiled crop (training uses 33x33)
    ("benchmarks/v1.0/append-still", (33, 33)),
])
def test_env_step_fused_equals_xla(suite, view):
    bank = loader.load_bank(suite)
    # Spawn only fires next to spawner cells; spawner-free levels are
    # deterministic regardless of spawn_prob, so both paths must agree.
    assert not (np.asarray(bank.board) & C.SPAWNING).any(), \
        "deterministic equivalence needs spawner-free levels"
    # Short time limit so auto-resets happen within the rollout.
    actions = np.random.RandomState(9).randint(0, 9, (12, B))
    cfg = dict(time_limit=6, auto_reset=True, view_shape=view)
    tr_xla = _rollout(
        BatchedSafeLifeEnv(EnvConfig(use_pallas=False, **cfg)), bank, actions)
    tr_fused = _rollout(
        BatchedSafeLifeEnv(EnvConfig(pallas_interpret=True, **cfg)),
        bank, actions)
    for t, (a, b) in enumerate(zip(tr_xla, tr_fused)):
        for k in a:
            np.testing.assert_array_equal(
                a[k], b[k], err_msg=f"step {t}, field {k}")


def test_env_step_fused_equals_xla_goal_spawner_bank():
    """End-to-end equivalence on a bank whose GOAL boards contain
    spawners (the stress-bench shape, taking the two-stencil
    spawn-simple pair path).  spawn_prob is zero on every level, so the
    spawn draws can never fire and both paths are deterministic while the
    spawner-presence/count plumbing still runs."""
    from safelife_tpu.levels import synth
    levels = [synth.simple_level(26, 26, spawners=False, seed=i,
                                 dynamic_goals=True) for i in range(8)]
    bank = loader.build_bank(levels)
    assert bank.spawn_simple_goals and not bank.simple_goals \
        and not bank.static_goals and not bank.spawnless
    assert float(np.asarray(bank.spawn_prob).max()) == 0.0
    actions = np.random.RandomState(17).randint(0, 9, (12, B))
    cfg = dict(time_limit=6, auto_reset=True, view_shape=(15, 15))
    tr_xla = _rollout(
        BatchedSafeLifeEnv(EnvConfig(use_pallas=False, **cfg)), bank, actions)
    tr_fused = _rollout(
        BatchedSafeLifeEnv(EnvConfig(pallas_interpret=True, **cfg)),
        bank, actions)
    for t, (a, b) in enumerate(zip(tr_xla, tr_fused)):
        for k in a:
            np.testing.assert_array_equal(
                a[k], b[k], err_msg=f"step {t}, field {k}")


