"""Interactive GameLoop: scripted key sequences drive play, undo, edit,
restart and in-play recording without a TTY (the frontend-agnostic
handle_key API that both the terminal and pyglet frontends use)."""

import glob
import os

import numpy as np

from safelife_tpu import cells as C
from safelife_tpu.interactive.play import GameLoop
from safelife_tpu.levels import synth
from safelife_tpu.game import SafeLifeGame


def make_game():
    lv = synth.simple_level(12, 12, seed=3)
    game = SafeLifeGame(board_size=None)
    game.deserialize({k: v for k, v in lv.items() if k not in ("name",)
                      and not k.startswith("agent")}
                     | {"agent_loc": (int(lv["agent_col"]),
                                      int(lv["agent_row"])),
                        "orientation": int(lv["orientation"]),
                        "spawn_prob": float(lv["spawn_prob"]),
                        "min_performance": float(lv["min_performance"])})
    return game


def make_loop(game):
    loop = GameLoop(iter([]))
    loop.start_level(game)
    return loop


def test_play_keys_advance_and_undo():
    game = make_game()
    loop = make_loop(game)
    board0 = game.board.copy()
    loc0 = game.agent_loc
    loop.handle_key("UP")
    assert game.num_steps == 1
    loop.handle_key("z")  # undo
    assert game.num_steps == 0
    np.testing.assert_array_equal(game.board, board0)
    assert game.agent_loc == loc0
    loop.handle_key("z")
    assert loop.message == "nothing to undo"


def test_edit_mode_places_cells():
    game = make_game()
    loop = make_loop(game)
    loop.handle_key("e")
    assert loop.edit_mode == "BOARD"
    loop.handle_key("RIGHT")           # move cursor off the agent
    x, y = game.edit_loc
    loop.handle_key("w")               # put wall
    assert game.board[y, x] & ~np.uint16(C.COLORS) == C.WALL
    loop.handle_key("c")               # cycle color
    assert "EDIT COLOR" in loop.message
    loop.handle_key("g")
    assert loop.edit_mode == "GOALS"
    loop.handle_key("l")               # put life into the goal board
    assert game.goals[y, x] & C.ALIVE
    loop.handle_key("\x1b")
    assert loop.edit_mode is None


def test_restart_reverts():
    game = make_game()
    loop = make_loop(game)
    for k in ("UP", "UP", "RIGHT"):
        loop.handle_key(k)
    assert game.num_steps == 3
    loop.handle_key("R")
    assert game.num_steps == 0 and not loop.history


def test_recording_saves_trajectory(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    game = make_game()
    loop = make_loop(game)
    loop.handle_key("*")
    assert loop.message == "nothing to record"
    for k in ("UP", "RIGHT", "UP"):
        loop.handle_key(k)
    loop.handle_key("*")
    files = glob.glob(os.path.join("plays", "rec-*.npz"))
    assert len(files) == 1, loop.message
    with np.load(files[0]) as data:
        assert data["board"].shape[0] == 4          # 3 moves + final frame
        assert data["board"].shape[1:] == game.board.shape
        assert data["goals"].shape == data["board"].shape
        assert data["agent_loc"].shape == (4, 2)
    # renders to a gif via the standard renderer
    from safelife_tpu.render.graphics import render_file
    out = render_file(files[0])
    assert out.endswith(".gif") and os.path.exists(out)


def test_sprite_sheet_loader(tmp_path):
    """A reference-format sprite sheet (render_graphics.py:13-44 layout:
    14px RGBA tiles, agent orientations at row 0 cols 1-4) replaces the
    procedural art: alpha is the mask, sprite RGB modulates the per-cell
    foreground color.  The renderer must keep shape/dtype and actually
    use the sheet."""
    import imageio.v2 as imageio
    import safelife_tpu.cells as C
    from safelife_tpu.render import graphics as G

    sheet = np.zeros((14 * 4, 14 * 5, 4), np.uint8)
    for i in range(4):
        for j in range(5):
            sheet[14 * i:14 * i + 14, 14 * j:14 * j + 14, :3] = \
                (50 * i + 20, 40 * j + 20, 180)
            sheet[14 * i + 3:14 * i + 11, 14 * j + 3:14 * j + 11, 3] = 255
    path = str(tmp_path / "sheet.png")
    imageio.imwrite(path, sheet)

    board = np.array([[C.LIFE | C.COLOR_G, C.WALL],
                      [C.PLAYER, C.SPAWNER | C.COLOR_R]], np.uint16)
    img_proc = G.render_board(board)
    saved = (dict(G.SPRITES), list(G.AGENT_SPRITES),
             dict(G.SPRITE_RGB), G.AGENT_SPRITE_RGB)
    try:
        G.load_sprite_sheet(path)
        img_sheet = G.render_board(board)
    finally:  # restore procedural art for other tests
        G.SPRITES.clear(); G.SPRITES.update(saved[0])
        G.AGENT_SPRITES[:] = saved[1]
        G.SPRITE_RGB.clear(); G.SPRITE_RGB.update(saved[2])
        G.AGENT_SPRITE_RGB = saved[3]
    assert img_sheet.shape == img_proc.shape == (28, 28, 3)
    assert img_sheet.dtype == np.uint8
    assert not np.array_equal(img_sheet, img_proc)
    # background (goal tint) shows through where the sheet alpha is 0:
    # the tile corners are transparent, so corner pixels equal GOAL_RGB[0].
    assert tuple(img_sheet[0, 0]) == tuple(G.GOAL_RGB[0])
