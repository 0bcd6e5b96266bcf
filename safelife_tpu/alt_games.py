"""Alternative rule engines: generalized B/S Life and asynchronous updates.

Capability parity with the reference's experimental classes
(``safelife/safelife_game.py:667-832``): :class:`GameOfLife` exposes
configurable born/survive rules via a whole-board convolution step, and
:class:`AsyncGame` updates cells one at a time with energy rules + a
temperature (conway / ising / vine rule sets).
"""

import numpy as np
from scipy.signal import convolve2d

from . import cells as C
from .game import SafeLifeGame


def _wrap_conv(x, cfilter):
    return convolve2d(x, cfilter, mode="same", boundary="wrap")


class GameOfLife(SafeLifeGame):
    """Generalized B/S cellular automaton (default B3/S23)."""

    survive_rule = (2, 3)
    born_rule = (3,)

    def advance_board(self):
        self.num_steps += 1
        board = self.board
        cfilter = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], np.uint16)

        alive = (board & C.ALIVE) > 0
        spawning = (board & C.SPAWNING) > 0
        frozen = (board & C.FROZEN) > 0

        can_die = ~frozen & (_wrap_conv(board & C.PRESERVING, cfilter) == 0)
        can_grow = ~frozen & (_wrap_conv(board & C.INHIBITING, cfilter) == 0)

        num_neighbors = _wrap_conv(alive, cfilter)
        num_spawn = _wrap_conv(spawning, cfilter)
        spawn_prob = 1 - (1 - self.spawn_prob) ** num_spawn
        has_spawned = np.random.random(board.shape) < spawn_prob

        born_rule = np.zeros(9, bool)
        born_rule[list(self.born_rule)] = True
        dead_rule = np.ones(9, bool)
        dead_rule[list(self.survive_rule)] = False

        new_alive = (born_rule[num_neighbors] | has_spawned) \
            & ~alive & can_grow
        new_dead = dead_rule[num_neighbors] & alive & can_die

        new_flags = np.zeros_like(board)
        color_weights = 1 * alive + 2 * spawning
        for color in C.COLOR_TUPLE:
            has_color = (board & color) > 0
            new_color = _wrap_conv(has_color * color_weights, cfilter) >= 2
            new_flags += np.uint16(color) * new_color
        indestructible = alive & ((board & C.DESTRUCTIBLE) == 0)
        new_flags += np.uint16(C.DESTRUCTIBLE) * \
            (_wrap_conv(indestructible, cfilter) < 2)

        board *= ~(new_alive | new_dead)
        board += new_alive * (np.uint16(C.ALIVE) + new_flags)

    @property
    def is_stochastic(self):
        return (self.board & C.SPAWNING).any()


class AsyncGame(SafeLifeGame):
    """Asynchronous per-cell stochastic updates with energy rules."""

    energy_rule_sets = {
        "conway": (
            (-1, -1, +1, +1, -1, -1, -1, -1, -1),
            (-1, -1, -1, +1, -1, -1, -1, -1, -1),
        ),
        "ising": (
            (-2, -1, 0, +1, +2),
            (-2, -1, 0, +1, +2),
        ),
        "vine": (
            (-1, -1, +1, +1, +1),
            (-1, +1, -1, -1, -1),
        ),
    }
    energy_rules = energy_rule_sets["conway"]
    temperature = 0
    cells_per_update = 0.3

    def serialize(self):
        data = super().serialize()
        data["energy_rules"] = self.energy_rules
        return data

    def deserialize(self, data, *args, **kw):
        super().deserialize(data, *args, **kw)
        keys = data.dtype.fields if hasattr(data, "dtype") else data
        if "energy_rules" in keys:
            self.energy_rules = data["energy_rules"]

    def advance_board(self):
        board = self.board
        rules = self.energy_rules
        h, w = board.shape
        beta = 1.0 / max(1e-20, self.temperature)
        n_nb = len(rules[0]) - 1
        if n_nb == 4:
            neighborhood = np.array([[0, 1, 0], [1, 0, 1], [0, 1, 0]])
        elif n_nb == 6:
            neighborhood = np.array([[0, 1, 1], [1, 0, 1], [1, 1, 0]])
        elif n_nb == 8:
            neighborhood = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]])
        else:
            raise RuntimeError("async rules must have length 5, 7, or 9")
        self.num_steps += 1
        for _ in range(int(board.size * self.cells_per_update)):
            x = np.random.randint(w)
            y = np.random.randint(h)
            if board[y, x] & C.FROZEN:
                continue
            rows = (np.arange(y - 1, y + 2) % h)[:, None]
            cols = (np.arange(x - 1, x + 2) % w)[None, :]
            neighbors = board[rows, cols] * neighborhood
            alive_neighbors = int(np.sum((neighbors & C.ALIVE) > 0))
            spawn_neighbors = int(np.sum((neighbors & C.SPAWNING) > 0))
            if np.sum(neighbors & C.FREEZING) > 0:
                continue
            if board[y, x] & C.ALIVE:
                energy = rules[0][alive_neighbors]
            else:
                energy = rules[1][alive_neighbors]
            p = 0.5 + 0.5 * np.tanh(energy * beta)
            p = 1 - (1 - p) * (1 - self.spawn_prob) ** spawn_neighbors
            board[y, x] = C.LIFE if np.random.random() < p else C.EMPTY
