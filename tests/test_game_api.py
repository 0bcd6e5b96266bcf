"""Host game API tests: action parity against the batched env, npz wire
format roundtrip, editing, and renderers."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from safelife_tpu import cells as C
from safelife_tpu.env.env import ACTION_NAMES, BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.game import SafeLifeGame
from safelife_tpu.levels import loader
from safelife_tpu.render import graphics, text as render_text


def load_game(path="benchmarks/v1.0/append-still.npz", index=0):
    fname = next(loader.find_files(path))
    with np.load(fname) as data:
        game = SafeLifeGame(board_size=None)
        game.deserialize(data["levels"][index])
    return game


def test_game_matches_batched_env():
    """Same deterministic level, same action sequence: the host game and the
    batched env produce identical boards and rewards step by step."""
    game = load_game()
    game.update_exit_colors()

    bank = loader.load_bank("benchmarks/v1.0/append-still.npz")
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(15, 15), auto_reset=False))
    state = env.reset_to_levels(bank, jnp.zeros(1, jnp.int32))

    rng = np.random.RandomState(5)
    key = jax.random.PRNGKey(0)
    for t in range(60):
        a = int(rng.randint(0, 9))
        # host game
        pts0 = game.current_points()
        reward = game.execute_action(ACTION_NAMES[a])
        game.advance_board()
        game.update_exit_colors()
        reward += game.current_points() - pts0
        # batched env (spawn fields all false — append-still is deterministic)
        key, k = jax.random.split(key)
        spawn = jnp.zeros(state.board.shape, bool)
        state, ts = env.step(state, bank, jnp.array([a]), k,
                             spawn_board=spawn, spawn_goals=spawn)
        np.testing.assert_array_equal(
            np.asarray(state.board[..., 0]), game.board,
            err_msg=f"board diverged at step {t} (action {ACTION_NAMES[a]})")
        assert float(ts.reward[0]) == float(reward), (t, ACTION_NAMES[a])
        assert bool(ts.state_before_reset.game_over[0]) == bool(game.game_over)
        if game.game_over:
            break


def test_game_matches_batched_env_on_examples():
    """Cross-check the host game against the batched env over the whole
    examples set, stepped as ONE batch: these boards exercise crates, ice
    cubes, plants, parasites, fountains and colored life — push/pull/
    toggle/freeze paths the single benchmark level above never reaches.
    Spawn fields are forced false so both paths stay deterministic.
    Lanes whose episode ends are dropped from the comparison (the host
    game stops at game_over; the batched env keeps lockstep)."""
    levels = loader.load_levels(
        os.path.join(os.path.dirname(loader.__file__), "data", "examples"))
    groups = loader.group_by_shape(levels)
    lvls = max(groups.values(), key=len)  # largest uniform-shape group
    assert len(lvls) >= 8
    bank = loader.build_bank(lvls)
    n = bank.num_levels

    games = []
    for lv in lvls:
        g = SafeLifeGame(board_size=None)
        g.deserialize({
            "board": lv["board"], "goals": lv["goals"],
            "agent_loc": (int(lv["agent_col"]), int(lv["agent_row"])),
            "orientation": int(lv["orientation"]),
            # Spawn draws are masked off on BOTH paths (the env gets
            # all-false spawn fields below) to keep the rollout
            # deterministic; everything else about spawners still runs.
            "spawn_prob": 0.0,
            "min_performance": float(lv["min_performance"]),
        })
        g.update_exit_colors()
        games.append(g)

    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(15, 15),
                                       auto_reset=False))
    state = env.reset_to_levels(bank, jnp.arange(n))
    rng = np.random.RandomState(11)
    key = jax.random.PRNGKey(3)
    alive = np.ones(n, bool)
    for t in range(40):
        acts = rng.randint(0, 9, n)
        rewards = np.zeros(n)
        for i, g in enumerate(games):
            if not alive[i]:
                continue
            pts0 = g.current_points()
            r = g.execute_action(ACTION_NAMES[acts[i]])
            g.advance_board()
            g.update_exit_colors()
            rewards[i] = r + g.current_points() - pts0
        key, k = jax.random.split(key)
        spawn = jnp.zeros(state.board.shape, bool)
        state, ts = env.step(state, bank, jnp.asarray(acts), k,
                             spawn_board=spawn, spawn_goals=spawn)
        board = np.asarray(state.board)
        for i, g in enumerate(games):
            if not alive[i]:
                continue
            np.testing.assert_array_equal(
                board[..., i], g.board,
                err_msg=f"level '{lvls[i]['name']}' diverged at step {t} "
                        f"(action {ACTION_NAMES[acts[i]]})")
            assert float(ts.reward[i]) == rewards[i], (
                lvls[i]["name"], t, ACTION_NAMES[acts[i]])
            assert bool(ts.state_before_reset.game_over[i]) == g.game_over
            if g.game_over:
                alive[i] = False
    assert alive.sum() >= n // 2, "too many episodes ended to be meaningful"


def test_serialize_roundtrip(tmp_path):
    game = load_game(index=3)
    game.execute_action("MOVE RIGHT")
    game.advance_board()
    fname = os.path.join(str(tmp_path), "saved")
    game.save(fname)
    loaded = SafeLifeGame.load(fname + ".npz")
    np.testing.assert_array_equal(loaded.board, game.board)
    np.testing.assert_array_equal(loaded.goals, game.goals)
    assert loaded.agent_loc == game.agent_loc
    assert loaded.orientation == game.orientation
    assert loaded.min_performance == game.min_performance


def test_load_reference_handmade_level():
    """Hand-authored reference levels load through the same wire format."""
    game = SafeLifeGame.load(next(loader.find_files("puzzles/*.npz")))
    assert game.board.shape == game.goals.shape
    assert (game.board & C.AGENT).any()


def test_editor_commands():
    game = SafeLifeGame(board_size=(8, 8))
    game.edit_loc = (2, 3)
    game.execute_edit("PUT WALL")
    assert game.board[3, 2] == C.WALL
    game.execute_edit("CHANGE COLOR")
    assert game.edit_color == C.COLOR_R
    game.execute_edit("PUT LIFE")
    assert game.board[3, 2] == (C.LIFE | C.COLOR_R)
    game.execute_edit("EDIT GOALS: PUT LIFE")
    assert game.goals[3, 2] == (C.LIFE | C.COLOR_R)
    game.execute_edit("MOVE RIGHT")
    assert game.edit_loc == (3, 3)
    game.execute_edit("PUT AGENT")
    assert game.agent_loc == (3, 3)
    assert game.board[3, 3] & C.AGENT


def test_text_renderer():
    game = load_game()
    out = render_text.render_game(game)
    assert "\x1b[" in out and "X" in out  # colored, exit visible
    # view-limited render with exits projected to perimeter
    out2 = render_text.render_game(game, view_size=(7, 7))
    assert out2.count("\n") == 9  # 7 rows + top/bottom borders + trailing
    assert render_text.cell_name(C.LIFE | C.COLOR_G) == "life-green"
    assert render_text.cell_name(C.WALL) == "wall-gray"


def test_graphics_renderer(tmp_path):
    game = load_game()
    img = graphics.render_game(game)
    h, w = game.board.shape
    assert img.shape == (h * 14, w * 14, 3)
    assert img.dtype == np.uint8
    assert img.std() > 0  # actually drew something
    # file rendering
    fname = os.path.join(str(tmp_path), "level.npz")
    game.save(fname)
    out = graphics.render_file(fname)
    assert out.endswith(".png") and os.path.exists(out)


def test_trajectory_gif(tmp_path):
    game = load_game()
    boards, goals, orients = [], [], []
    for _ in range(4):
        game.execute_action("MOVE RIGHT")
        game.advance_board()
        boards.append(game.board.copy())
        goals.append(game.goals.copy())
        orients.append(game.orientation)
    fname = os.path.join(str(tmp_path), "traj.npz")
    np.savez(fname, board=np.stack(boards), goals=np.stack(goals),
             orientation=np.array(orients))
    out = graphics.render_file(fname)
    assert out.endswith(".gif") and os.path.exists(out)
