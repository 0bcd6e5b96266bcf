"""Single-board host-side game: the interactive / editing / file-format API.

Capability parity with the reference's ``GameState`` / ``GameWithGoals`` /
``SafeLifeGame`` stack (``safelife/safelife_game.py:123-664``): actions
(absolute and relative moves, turns, toggles), movement with push/pull and
exit detection, the full board editor, npz serialize/save/load in the
reference wire format, revert, board shift/resize/clip, scoring and exit
gating.

This is deliberately plain numpy: the batched JAX environment
(:mod:`safelife_tpu.env.env`) is the training/benchmark hot path; this class
exists for interactive play, level editing, file IO and as a readable
executable spec.  Physics goes through the bit-exact numpy oracle
(:mod:`safelife_tpu.ops.life_numpy`), driven by the reference-compatible
buffered MT19937 stream (:mod:`safelife_tpu.utils.rng`) so fixed-seed games
replay the reference C engine exactly.
"""

import os

import numpy as np

from . import cells as C
from .cells import CellTypes, NAMED_CELLS, POINT_TABLE
from .ops import life_numpy
from .utils.rng import NumpyRandomBridge

ORIENTATION = {
    "UP": 0,
    "RIGHT": 1,
    "DOWN": 2,
    "LEFT": 3,
    "FORWARD": 4,
    "BACKWARD": 6,
}

_EDIT_TOGGLES = {
    "ALIVE": C.ALIVE,
    "INHIBITING": C.INHIBITING,
    "PRESERVING": C.PRESERVING,
    "SPAWNING": C.SPAWNING,
}

# Module-level RNG mirroring the reference's global numpy stream
# (speedups_src/random.c): `seed()` reseeds it; games draw from it unless
# given their own bridge.
_global_rng = NumpyRandomBridge()


def seed(value):
    """Seed the global CA random stream (reference: ``speedups.seed``)."""
    _global_rng.seed(value)


class SafeLifeGame:
    """One game board with goals — play, edit, save, load."""

    spawn_prob = 0.3
    orientation = 1
    agent_loc = (0, 0)
    edit_loc = (0, 0)
    edit_color = 0
    board = None
    goals = None
    file_name = None
    game_over = False
    points_on_level_exit = +1
    num_steps = 0
    min_performance = -1

    can_toggle_powers = False
    can_toggle_colors = False

    def __init__(self, board_size=(10, 10), rng=None):
        self.exit_locs = (np.array([], dtype=int), np.array([], dtype=int))
        self.rng = rng or _global_rng
        if board_size is not None:
            self.make_default_board(board_size)
            self._init_data = self.serialize()

    def make_default_board(self, board_size):
        self.board = np.zeros(board_size, dtype=np.uint16)
        self.goals = np.zeros_like(self.board)
        self.agent_loc = (board_size[1] // 2, board_size[0] // 2)
        self.board[self.agent_loc[1], self.agent_loc[0]] = C.PLAYER

    # -- geometry ---------------------------------------------------------

    @property
    def width(self):
        return self.board.shape[1]

    @property
    def height(self):
        return self.board.shape[0]

    @property
    def title(self):
        if self.file_name is None:
            return None
        fname = os.path.split(self.file_name)[-1]
        return ".".join(fname.split(".")[:-1])

    @property
    def edit_color_name(self):
        return C.COLOR_INDEX_NAMES[
            (self.edit_color & C.COLORS) >> C.COLOR_BIT]

    def relative_loc(self, n_forward, n_right=0):
        """Location relative to the agent (wraps; reference :296-308)."""
        dx = n_right
        dy = -n_forward
        for _ in range(self.orientation):
            dx, dy = -dy, dx
        x0, y0 = self.agent_loc
        return (x0 + dx) % self.width, (y0 + dy) % self.height

    # -- serialization (wire-compatible with the reference) ----------------

    def serialize(self):
        cls = self.__class__
        return {
            "spawn_prob": self.spawn_prob,
            "orientation": self.orientation,
            "agent_loc": self.agent_loc,
            "board": self.board.copy(),
            "goals": self.goals.copy(),
            "class": "%s.%s" % (cls.__module__, cls.__name__),
            "min_performance": self.min_performance,
        }

    def deserialize(self, data, as_initial_state=True):
        keys = data.dtype.fields if hasattr(data, "dtype") else data
        if as_initial_state:
            self._init_data = data
        self.board = np.array(data["board"], dtype=np.uint16)
        self.goals = np.array(data["goals"], dtype=np.uint16) \
            if "goals" in keys else np.zeros_like(self.board)
        if "spawn_prob" in keys:
            self.spawn_prob = float(data["spawn_prob"])
        if "orientation" in keys:
            self.orientation = int(data["orientation"])
        if "agent_loc" in keys:
            self.agent_loc = tuple(int(v) for v in data["agent_loc"])
        if "min_performance" in keys:
            self.min_performance = float(data["min_performance"])
        self.update_exit_locs()
        self.game_over = False
        self.num_steps = 0

    def save(self, file_name=None):
        file_name = file_name or self.file_name
        if file_name is None:
            raise ValueError("Must specify a file name")
        file_name = os.path.abspath(os.path.expanduser(file_name))
        if not file_name.endswith(".npz"):
            file_name += ".npz"
        self.file_name = file_name
        self._init_data = self.serialize()
        self.num_steps = 0
        np.savez_compressed(file_name, **self._init_data)

    def revert(self):
        if hasattr(self, "_init_data"):
            self.deserialize(self._init_data)
            return True
        return False

    @classmethod
    def loaddata(cls, data):
        obj = cls(board_size=None)
        obj.deserialize(data)
        return obj

    @classmethod
    def load(cls, file_name):
        file_name = os.path.abspath(os.path.expanduser(file_name))
        obj = cls.loaddata(np.load(file_name))
        obj.file_name = file_name
        return obj

    # -- actions ------------------------------------------------------------

    def move_agent(self, dy, dx=0):
        """Move/push/pull; returns reward (reference :310-345)."""
        x0, y0 = self.agent_loc
        x1, y1 = self.relative_loc(dy, dx)
        x2, y2 = self.relative_loc(-dy, -dx)
        can_push = (abs(dy), dx) == (1, 0)
        board = self.board
        reward = 0
        if board[y1, x1] == C.EMPTY:
            board[y1, x1] = board[y0, x0]
            board[y0, x0] = C.EMPTY
            self.agent_loc = (x1, y1)
        elif (board[y1, x1] & C.EXIT) and self.can_exit():
            self.game_over = True
            reward += self.points_on_level_exit
        elif can_push and board[y1, x1] & C.PUSHABLE:
            x3, y3 = self.relative_loc(dy * 2)
            if board[y3, x3] == C.EMPTY:
                board[y3, x3] = board[y1, x1]
                board[y1, x1] = board[y0, x0]
                board[y0, x0] = C.EMPTY
                self.agent_loc = (x1, y1)
            elif board[y3, x3] & C.EXIT:
                board[y1, x1] = board[y0, x0]
                board[y0, x0] = C.EMPTY
                self.agent_loc = (x1, y1)
        agent_did_move = self.agent_loc == (x1, y1) and (x0, y0) != (x1, y1)
        if can_push and board[y2, x2] & C.PULLABLE and agent_did_move:
            board[y0, x0] = board[y2, x2]
            board[y2, x2] = C.EMPTY
        return reward

    def execute_action(self, action):
        """Execute a named action; returns reward (reference :347-393)."""
        board = self.board
        reward = 0
        if self.game_over:
            pass
        elif action.startswith("MOVE "):
            direction = ORIENTATION[action[5:]]
            if direction < 4:
                self.orientation = direction
                reward = self.move_agent(1)
            else:
                reward = self.move_agent(5 - direction)
        elif action.startswith("TURN "):
            self.orientation += 2 - ORIENTATION[action[5:]]
            self.orientation %= 4
        elif action.startswith("FACE "):
            self.orientation = ORIENTATION[action[5:]]
        elif action.startswith("TOGGLE"):
            if len(action) > 6:
                self.orientation = ORIENTATION[action[7:]]
            x0, y0 = self.agent_loc
            x1, y1 = self.relative_loc(1)
            player_color = board[y0, x0] & C.COLORS
            target_cell = board[y1, x1]
            if target_cell == C.EMPTY:
                board[y1, x1] = C.LIFE | player_color
            elif target_cell & C.DESTRUCTIBLE:
                board[y1, x1] = C.EMPTY
            else:
                toggle_bits = C.POWERS * self.can_toggle_powers
                toggle_bits |= C.COLORS * self.can_toggle_colors
                board[y0, x0] ^= board[y1, x1] & toggle_bits
        elif action == "RESTART":
            self.game_over = "RESTART"
        return reward

    # -- editing ------------------------------------------------------------

    def execute_edit(self, command):
        """Board editor commands (reference :395-462)."""
        board = self.board
        x0, y0 = self.agent_loc
        x1, y1 = self.edit_loc
        if command.startswith("MOVE "):
            direction = ORIENTATION[command[5:]]
            if direction % 2 == 0:
                dx, dy = 0, direction - 1
            else:
                dx, dy = 2 - direction, 0
            self.edit_loc = ((x1 + dx) % self.width, (y1 + dy) % self.height)
        elif command == "PUT AGENT":
            agent = board[y0, x0] & ~np.uint16(C.COLORS)
            board[y0, x0] = 0
            board[y1, x1] = agent | self.edit_color
            self.agent_loc = self.edit_loc
        elif (command.startswith("PUT ") and command[4:] in NAMED_CELLS
                and self.agent_loc != self.edit_loc):
            board[y1, x1] = NAMED_CELLS[command[4:]]
            if board[y1, x1]:
                board[y1, x1] |= self.edit_color
        elif command.startswith("CHANGE COLOR"):
            if command.endswith("FULL CYCLE"):
                self.edit_color += C.COLOR_R
            elif self.edit_color:
                self.edit_color <<= 1
            else:
                self.edit_color = C.COLOR_R
            self.edit_color &= C.COLORS
            return "EDIT COLOR: " + self.edit_color_name
        elif command.startswith("TOGGLE ") and command[7:] in _EDIT_TOGGLES:
            board[y0, x0] ^= np.uint16(_EDIT_TOGGLES[command[7:]])
        elif command == "REVERT":
            if not self.revert():
                return "No saved state; cannot revert."
        elif command == "ABORT LEVEL":
            self.game_over = "ABORT LEVEL"
        elif command.startswith("EDIT GOALS: "):
            # Run an edit against the goal board (reference GameWithGoals
            # swaps board and goals around the edit, :567-575).
            self.board, self.goals = self.goals, self.board
            try:
                return self.execute_edit(command[len("EDIT GOALS: "):])
            finally:
                self.board, self.goals = self.goals, self.board
        self.update_exit_locs()

    # -- board utilities ------------------------------------------------------

    def shift_board(self, dx, dy):
        self.board = np.roll(np.roll(self.board, dy, axis=0), dx, axis=1)
        self.goals = np.roll(np.roll(self.goals, dy, axis=0), dx, axis=1)
        self.agent_loc = tuple(
            (np.array(self.agent_loc) + [dx, dy]) % [self.width, self.height])
        self.update_exit_locs()

    def resize_board(self, dx, dy):
        height, width = self.board.shape
        if width + dx <= 0 or height + dy <= 0:
            raise ValueError("Cannot resize to zero.")
        for name in ("board", "goals"):
            old = getattr(self, name)
            new = np.zeros((height + dy, width + dx), dtype=old.dtype)
            h = height + min(0, dy)
            w = width + min(0, dx)
            new[:h, :w] = old[:h, :w]
            setattr(self, name, new)
        self.agent_loc = tuple(
            np.array(self.agent_loc) % [self.width, self.height])
        self.update_exit_locs()

    def clip_board(self, left=0, right=0, top=0, bottom=0):
        height, width = self.board.shape
        if left + right >= width or top + bottom >= height:
            raise ValueError("Board clipped to zero")
        self.shift_board(-left, -top)
        self.resize_board(-(left + right), -(bottom + top))

    # -- physics / scoring ----------------------------------------------------

    def advance_board(self):
        """One physics step for both board and goals (reference
        SafeLifeGame.advance_board, :657-660)."""
        self.board = life_numpy.advance_board_reference(
            self.board, self.spawn_prob, rng=self.rng)
        self.goals = life_numpy.advance_board_reference(
            self.goals, self.spawn_prob, rng=self.rng)
        self.num_steps += 1

    @property
    def is_stochastic(self):
        return (self.board & C.SPAWNING).any()

    def current_points(self, board=None, goals=None):
        board = self.board if board is None else board
        goals = self.goals if goals is None else goals
        goal_colors = (goals & C.COLORS) >> C.COLOR_BIT
        cell_colors = (board & C.COLORS) >> C.COLOR_BIT
        alive = board & C.ALIVE
        return int(np.sum(POINT_TABLE[goal_colors, cell_colors] * alive))

    def performance_ratio(self, unit_rewards=True):
        """(completed, possible) with unit rewards and frozen-immovable
        masking (reference GameWithGoals.performance_ratio, :601-631)."""
        if not hasattr(self, "_init_data"):
            return 0, 1
        sign_table = np.sign(POINT_TABLE) if unit_rewards else POINT_TABLE

        def score(board, goals):
            goal_colors = (goals & C.COLORS) >> C.COLOR_BIT
            cell_colors = (board & C.COLORS) >> C.COLOR_BIT
            alive = (board & C.ALIVE) != 0
            frozen_immovable = (board & (
                C.FROZEN | C.PUSHABLE | C.PULLABLE)) == C.FROZEN
            mask = alive & ~frozen_immovable
            return int(np.sum(sign_table[goal_colors, cell_colors] * mask))

        b0 = np.asarray(self._init_data["board"], np.uint16)
        g0 = np.asarray(self._init_data["goals"], np.uint16)
        baseline = score(b0, g0)
        completed = score(self.board, self.goals) - baseline
        goal_colors = (self.goals & C.COLORS) >> C.COLOR_BIT
        possible = int(np.sum(sign_table.max(axis=1)[goal_colors])) - baseline
        return completed, possible

    def can_exit(self):
        if self.min_performance < 0:
            return True
        completed, total = self.performance_ratio()
        return completed >= self.min_performance * total

    def update_exit_locs(self):
        self.exit_locs = np.nonzero(self.board & C.EXIT)

    def update_exit_colors(self):
        if self.can_exit():
            exit_type = C.LEVEL_EXIT | C.COLOR_R
        else:
            exit_type = C.LEVEL_EXIT
        i1, i2 = self.exit_locs
        self.board[i1, i2] = exit_type

    def check(self, condition):
        x, y = self.relative_loc(1)
        if condition == "IFEMPTY":
            return self.board[y, x] == C.EMPTY
        raise ValueError(f"Unknown condition '{condition}'")


# Alias matching the reference's class split; all functionality lives in one
# class here (CellTypes/GameState/GameWithGoals layering is a namespace
# concern, not a capability one).
GameState = SafeLifeGame
GameWithGoals = SafeLifeGame
