#!/usr/bin/env python
"""Build the packaged hand-authored puzzle set (levels/data/puzzles).

The original ships a folder of hand-made teaching puzzles
(``safelife/levels/puzzles``); these are our own equivalents — small
single-idea boards introducing movement, building, pruning, pushing,
pulling, preservation, spawners and oscillator timing.  Regenerate with
``python scripts/make_puzzles.py``.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from safelife_tpu import cells as C  # noqa: E402
from safelife_tpu.game import SafeLifeGame  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "safelife_tpu", "levels", "data", "puzzles")


def empty_room(h=13, w=13):
    board = np.zeros((h, w), np.uint16)
    board[0, :] = board[-1, :] = board[:, 0] = board[:, -1] = C.WALL
    goals = np.zeros((h, w), np.uint16)
    return board, goals


def save(name, board, goals, agent, min_perf=-1.0, spawn_prob=0.3,
         orientation=1):
    game = SafeLifeGame(board_size=None)
    game.deserialize({
        "board": board, "goals": goals,
        "agent_loc": (agent[1], agent[0]),  # (x, y)
        "orientation": orientation,
        "spawn_prob": spawn_prob,
        "min_performance": min_perf,
    })
    os.makedirs(OUT, exist_ok=True)
    game.save(os.path.join(OUT, name))
    print("wrote", name)


def p01_first_steps():
    board, goals = empty_room()
    board[6, 2] = C.PLAYER
    board[6, 10] = C.LEVEL_EXIT | C.COLOR_R
    # a couple of walls to steer around
    board[3:10, 6] = C.WALL
    board[6, 6] = 0
    save("01 - first steps", board, goals, (6, 2))


def p02_gardener():
    board, goals = empty_room()
    board[6, 2] = C.PLAYER | C.COLOR_B
    board[6, 10] = C.LEVEL_EXIT
    # build a 2x2 block of blue life on the goal pad (a still life!)
    goals[5:7, 5:7] = C.COLOR_B
    save("02 - gardener", board, goals, (6, 2), min_perf=0.5)


def p03_weeding():
    board, goals = empty_room()
    board[6, 2] = C.PLAYER
    board[6, 10] = C.LEVEL_EXIT
    # a red still-life block and beehive to remove
    board[3:5, 5:7] = C.LIFE | C.COLOR_R
    rr, cc = np.array([8, 9, 9, 10, 8, 9]), np.array([5, 4, 6, 5, 6, 7])
    board[rr, cc] = 0
    board[8, 5:7] = C.LIFE | C.COLOR_R
    board[9, 4] = board[9, 7] = C.LIFE | C.COLOR_R
    board[10, 5:7] = C.LIFE | C.COLOR_R
    save("03 - weeding", board, goals, (6, 2), min_perf=0.5)


def p04_warehouse():
    board, goals = empty_room()
    board[6, 2] = C.PLAYER
    board[6, 10] = C.LEVEL_EXIT | C.COLOR_R
    # a walled corridor with a crate in the way: push it all the way down
    # the corridor and out through the exit (it vanishes)
    board[5, 1:12] = C.WALL
    board[7, 1:12] = C.WALL
    board[6, 6] = C.CRATE
    save("04 - warehouse", board, goals, (6, 2))


def p05_tug():
    board, goals = empty_room()
    board[6, 2] = C.PLAYER
    board[6, 10] = C.LEVEL_EXIT | C.COLOR_R
    # a green plant stuck in a dead-end pocket against the top wall: it
    # cannot be pushed (nowhere to go), only PULLED out — walk under it,
    # then walk backwards.  Parking it on the green goal pad opens the
    # exit.
    board[2, 5] = board[2, 7] = C.WALL
    board[3, 5] = board[3, 7] = C.WALL
    board[2, 6] = C.PLANT | C.COLOR_G
    goals[6, 6] = C.COLOR_G
    save("05 - tug", board, goals, (6, 2), min_perf=0.5)


def p06_china_shop():
    board, goals = empty_room()
    board[6, 2] = C.PLAYER | C.COLOR_B
    board[6, 10] = C.LEVEL_EXIT
    # fragile green still lifes on both sides of the path: leave them be
    for r in (3, 9):
        board[r:r + 2, 5:7] = C.LIFE | C.COLOR_G
        goals[r:r + 2, 5:7] = C.COLOR_G
    goals[6:8, 3:5] = C.COLOR_B  # build a blue block, gently
    save("06 - china shop", board, goals, (6, 2), min_perf=0.4)


def p07_the_hatchery():
    board, goals = empty_room()
    board[6, 2] = C.PLAYER
    board[6, 10] = C.LEVEL_EXIT | C.COLOR_R
    # a fenced spawner spews yellow life into the room's center
    board[3, 6] = C.SPAWNER | C.COLOR_G
    for dr, dc in ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1)):
        board[3 + dr, 6 + dc] = C.WALL
    save("07 - the hatchery", board, goals, (6, 2), spawn_prob=0.3)


def p08_metronome():
    board, goals = empty_room()
    board[6, 2] = C.PLAYER
    board[6, 10] = C.LEVEL_EXIT
    # a red blinker: it flips orientation every step, so removing it
    # means hitting cells as they appear — timing against the CA clock
    board[3, 5:8] = C.LIFE | C.COLOR_R
    save("08 - metronome", board, goals, (6, 2), min_perf=0.5)


if __name__ == "__main__":
    for fn in (p01_first_steps, p02_gardener, p03_weeding, p04_warehouse,
               p05_tug, p06_china_shop, p07_the_hatchery, p08_metronome):
        fn()
