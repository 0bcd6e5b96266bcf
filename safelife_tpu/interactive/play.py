"""Terminal interactive play + level editor.

Capability parity with ``safelife/interactive_game.py`` (GameLoop): play
keys, undo history, full board/goal editor (PUT/TOGGLE/color-cycle), save,
per-level stats with side-effect scores, and iterating level files.  The
terminal (curses-free ANSI) path is implemented; the reference's optional
pyglet window is out of scope for a training framework.

Key bindings (play mode):
    arrows      move (absolute direction)
    space / c   toggle (create/destroy) in facing direction
    left/right of 'turning' keys: , and .   turn left / right
    z           undo one step
    R           restart level
    e           enter/leave board edit mode, g goal edit mode
    n           next level
    q           quit
In edit mode:
    arrows      move cursor
    letters     put cells (l=life, w=wall, r=crate, s=spawner, x=exit,
                t=tree, p=plant, i=icecube, f=fountain, u=weed, a=agent,
                k=parasite, SPACE=empty)
    c           cycle edit color
    g/b         toggle goal/board editing
    s           save level (prompts for filename)
"""

import os
import sys

import numpy as np

from .. import cells as C
from ..game import SafeLifeGame
from ..render import text as render_text
from ..side_effects import side_effect_score
from .keyboard import getkey

PLAY_KEYS = {
    "UP": "MOVE UP",
    "DOWN": "MOVE DOWN",
    "LEFT": "MOVE LEFT",
    "RIGHT": "MOVE RIGHT",
    " ": "TOGGLE",
    "c": "TOGGLE",
    ",": "TURN LEFT",
    ".": "TURN RIGHT",
}

EDIT_PUTS = {
    " ": "PUT EMPTY",
    "l": "PUT LIFE",
    "L": "PUT HARD LIFE",
    "w": "PUT WALL",
    "r": "PUT CRATE",
    "s": "PUT SPAWNER",
    "S": "PUT HARD SPAWNER",
    "x": "PUT EXIT",
    "i": "PUT ICECUBE",
    "p": "PUT PLANT",
    "t": "PUT TREE",
    "f": "PUT FOUNTAIN",
    "k": "PUT PARASITE",
    "u": "PUT WEED",
    "a": "PUT AGENT",
}

EDIT_MOVES = {"UP": "MOVE UP", "DOWN": "MOVE DOWN",
              "LEFT": "MOVE LEFT", "RIGHT": "MOVE RIGHT"}


class GameLoop:
    """Play through a sequence of levels in the terminal."""

    def __init__(self, levels, view_size=None, print_only=False,
                 undo_limit=10_000):
        self.levels = iter(levels)
        self.view_size = view_size
        self.print_only = print_only
        self.undo_limit = undo_limit

    # -- per-level loop ----------------------------------------------------

    def play(self, game: SafeLifeGame, out=sys.stdout):
        history = []
        total_points = 0
        edit_mode = None
        message = ""
        game.update_exit_colors()
        while True:
            self._draw(game, total_points, edit_mode, message, out)
            message = ""
            key = getkey()
            if key in ("q", "INTERRUPT", "EOF"):
                return "QUIT"
            if edit_mode:
                if key == "e" or key == "\x1b":
                    edit_mode = None
                elif key == "g":
                    edit_mode = "GOALS" if edit_mode == "BOARD" else "BOARD"
                elif key in EDIT_MOVES:
                    game.execute_edit(EDIT_MOVES[key])
                elif key == "c":
                    message = game.execute_edit("CHANGE COLOR") or ""
                elif key == "S":
                    fname = input("\nSave as: ")
                    if fname:
                        game.save(fname)
                        message = f"saved to {game.file_name}"
                elif key in EDIT_PUTS:
                    cmd = EDIT_PUTS[key]
                    if edit_mode == "GOALS":
                        cmd = "EDIT GOALS: " + cmd
                    message = game.execute_edit(cmd) or ""
                continue
            # play mode
            if key == "e":
                edit_mode = "BOARD"
                game.edit_loc = game.agent_loc
                continue
            if key == "z":
                if history:
                    data = history.pop()
                    game.deserialize(data, as_initial_state=False)
                    game.num_steps = data["num_steps"]
                    total_points = data["points"]
                else:
                    message = "nothing to undo"
                continue
            if key == "R":
                game.revert()
                total_points = 0
                history.clear()
                continue
            if key == "n":
                return "NEXT"
            if key in PLAY_KEYS:
                if len(history) >= self.undo_limit:
                    history.pop(0)
                snap = game.serialize()
                snap["num_steps"] = game.num_steps
                snap["points"] = total_points
                history.append(snap)
                start_points = game.current_points()
                reward = game.execute_action(PLAY_KEYS[key])
                game.advance_board()
                total_points += reward + game.current_points() - start_points
                game.update_exit_colors()
                if game.game_over:
                    self._finish(game, total_points, out)
                    return "NEXT"

    def _draw(self, game, points, edit_mode, message, out):
        out.write("\x1b[H\x1b[J")  # clear screen
        title = game.title or "SafeLife"
        mode = f" [EDIT {edit_mode}]" if edit_mode else ""
        out.write(f"{title}{mode}   steps: {game.num_steps}  "
                  f"points: {points}\n")
        out.write(render_text.render_game(
            game, self.view_size, edit_mode))
        comp, poss = game.performance_ratio()
        out.write(f"progress: {comp}/{poss}   "
                  f"powers: {render_text.agent_powers(game)}\n")
        if message:
            out.write(message + "\n")
        out.flush()

    def _finish(self, game, points, out):
        comp, poss = game.performance_ratio()
        out.write(f"\nLevel complete!  points={points}  "
                  f"performance={comp}/{poss}\n")
        out.write("computing side effects...\n")
        out.flush()
        try:
            scores = side_effect_score(game, num_samples=200)
            for key, (emd, mass) in sorted(scores.items()):
                out.write(f"  {render_text.cell_name(key)}: "
                          f"{emd:.2f} (of {mass:.1f})\n")
        except Exception as exc:  # pragma: no cover
            out.write(f"  side effect scoring failed: {exc}\n")
        out.flush()

    # -- entry points --------------------------------------------------------

    def run(self):
        for game in self.levels:
            if self.print_only:
                print(render_text.render_game(game, self.view_size))
                continue
            if self.play(game) == "QUIT":
                break


def games_from_files(*paths):
    """Yield SafeLifeGame objects from level files (npz archives too)."""
    from ..levels import loader

    for fname in loader.find_files(*paths):
        if fname.endswith((".yaml", ".json")):
            from ..procgen import gen_game_from_file
            yield gen_game_from_file(fname)
            continue
        with np.load(fname) as data:
            if "levels" in data:
                for rec in data["levels"]:
                    game = SafeLifeGame(board_size=None)
                    game.deserialize(rec)
                    game.file_name = os.path.join(
                        fname, str(rec["name"]))
                    yield game
            else:
                yield SafeLifeGame.load(fname)
