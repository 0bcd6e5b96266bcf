"""Generate golden parity fixtures by driving the *reference* SafeLife engine.

Run once (requires the reference repo built at /tmp/refbuild — see README):

    python tests/golden/generate_golden.py

The recorded fixtures are the ground truth for bit-exact parity tests: the
TPU framework must reproduce every board, reward and observation below under
the same seeds.  Only the *outputs* of the reference are stored here (plain
npz data); no reference code is used at test time.

Reference semantics exercised (file:line cites into /root/reference):
  - CA step:      safelife/speedups_src/advance_board.c:34-120
  - env step:     safelife/safelife_env.py:157-186
  - actions:      safelife/safelife_game.py:308-393
  - observations: safelife/safelife_env.py:125-155, helper_utils.py:41-74
  - RNG contract: safelife/speedups_src/random.c:8-57
"""

import os
import random
import sys

import numpy as np

REF = "/tmp/refbuild"
OUT = os.path.dirname(os.path.abspath(__file__))
LEVELS = "/root/reference/safelife/levels"

sys.path.insert(0, REF)

from safelife import speedups  # noqa: E402
from safelife.safelife_game import SafeLifeGame, CellTypes  # noqa: E402
from safelife.helper_utils import recenter_view  # noqa: E402

ACTION_NAMES = (
    "NULL",
    "MOVE UP", "MOVE RIGHT", "MOVE DOWN", "MOVE LEFT",
    "TOGGLE UP", "TOGGLE RIGHT", "TOGGLE DOWN", "TOGGLE LEFT",
)


def load_level(archive, idx):
    with np.load(os.path.join(LEVELS, archive)) as data:
        level = data["levels"][idx]
        game = SafeLifeGame(board_size=None)
        game.deserialize(level)
        return game


def load_single(path):
    game = SafeLifeGame(board_size=None)
    with np.load(os.path.join(LEVELS, path)) as data:
        game.deserialize({k: data[k] for k in data.files})
    return game


def gen_ca_fixtures():
    """Pure CA-step sequences under fixed seed."""
    rng = np.random.RandomState(123)
    boards = {}

    # Synthetic soup exercising every flag bit.
    flags = np.array([1, 2, 4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 32768],
                     dtype=np.uint16)
    soup = np.zeros((16, 24), np.uint16)
    for f in flags:
        soup |= f * (rng.random((16, 24)) < 0.12).astype(np.uint16)
    boards["soup"] = (soup, 0.3)

    blinker = np.zeros((8, 8), np.uint16)
    blinker[2, 2:5] = CellTypes.life
    boards["blinker"] = (blinker, 0.3)

    # Spawner board: stochastic path + RNG-order contract.
    spawn = np.zeros((12, 12), np.uint16)
    spawn[5, 5] = CellTypes.spawner | CellTypes.color_g
    spawn[2, 2] = CellTypes.hard_spawner | CellTypes.color_r
    spawn[8, 3:6] = CellTypes.life
    boards["spawners"] = (spawn, 0.4)

    for name, (archive, idx) in {
        "append-still-0": ("benchmarks/v1.0/append-still.npz", 0),
        "prune-still-0": ("benchmarks/v1.0/prune-still.npz", 0),
        "append-spawn-0": ("benchmarks/v1.0/append-spawn.npz", 0),
        "navigation-0": ("benchmarks/v1.0/navigation.npz", 0),
    }.items():
        game = load_level(archive, idx)
        boards[name + "-board"] = (game.board.copy(), game.spawn_prob)
        boards[name + "-goals"] = (game.goals.copy(), game.spawn_prob)

    out = {}
    for name, (board, spawn_prob) in boards.items():
        speedups.seed(17)
        steps = []
        b = board.copy()
        for _ in range(8):
            b = speedups.advance_board(b, spawn_prob)
            steps.append(b.copy())
        out[name + "/input"] = board
        out[name + "/steps"] = np.array(steps)
        out[name + "/spawn_prob"] = np.float64(spawn_prob)
    np.savez_compressed(os.path.join(OUT, "ca_steps.npz"), **out)
    print("wrote ca_steps.npz:", len(boards), "boards")


def get_obs(game, view_shape=(15, 15), remove_white=True):
    """Replica of SafeLifeEnv.get_obs (safelife_env.py:125-155)."""
    board = game.board.copy()
    goals = game.goals & CellTypes.rainbow_color
    if remove_white:
        goals = goals * (goals != CellTypes.rainbow_color)
    board += goals << 3
    board = recenter_view(
        board, view_shape, game.agent_loc[::-1], game.exit_locs)
    shift = np.arange(15, dtype=np.uint16)
    return (board[..., None] & (1 << shift)) >> shift


def env_step(game, action, old_value):
    """Replica of SafeLifeEnv.step (safelife_env.py:157-186), sans counters."""
    reward = game.execute_action(ACTION_NAMES[action])
    game.advance_board()
    new_value = game.current_points()
    reward += new_value - old_value
    game.update_exit_colors()
    return reward, new_value


def gen_episode_fixtures():
    episodes = {
        "append-still-0": ("benchmarks/v1.0/append-still.npz", 0, 120),
        "append-still-7": ("benchmarks/v1.0/append-still.npz", 7, 120),
        "prune-still-0": ("benchmarks/v1.0/prune-still.npz", 0, 120),
        "append-spawn-0": ("benchmarks/v1.0/append-spawn.npz", 0, 120),
        "navigation-0": ("benchmarks/v1.0/navigation.npz", 0, 120),
        "prune-dynamic-0": ("benchmarks/v1.0/prune-dynamic.npz", 0, 120),
        # VERDICT r3 #5(b): the remaining benchmark families.
        "append-dynamic-0": ("benchmarks/v1.0/append-dynamic.npz", 0, 120),
        "prune-spawn-0": ("benchmarks/v1.0/prune-spawn.npz", 0, 120),
        "prune-still-hard-0": ("benchmarks/v1.0/prune-still-hard.npz",
                               0, 120),
        # VERDICT r3 #5(c): long-horizon RNG-stream parity on a spawner
        # level — 520 steps of live spawn sampling.
        "append-spawn-3-long": ("benchmarks/v1.0/append-spawn.npz", 3, 520),
    }
    out = {}
    for name, (archive, idx, n_steps) in episodes.items():
        game = load_level(archive, idx)
        game.revert()
        game.update_exit_colors()
        speedups.seed(99)
        actions = random.Random(7).choices(range(9), k=n_steps)
        old_value = game.current_points()

        rec = {k: [] for k in ("board", "goals", "reward", "agent_loc",
                               "orientation", "game_over", "points",
                               "perf_completed", "perf_possible")}
        out[name + "/init_board"] = game.board.copy()
        out[name + "/init_goals"] = game.goals.copy()
        out[name + "/init_agent_loc"] = np.array(game.agent_loc)
        out[name + "/init_orientation"] = np.int64(game.orientation)
        out[name + "/min_performance"] = np.float64(game.min_performance)
        out[name + "/spawn_prob"] = np.float64(game.spawn_prob)
        out[name + "/init_points"] = np.int64(old_value)

        obs0 = get_obs(game)
        for t, a in enumerate(actions):
            reward, old_value = env_step(game, a, old_value)
            rec["board"].append(game.board.copy())
            rec["goals"].append(game.goals.copy())
            rec["reward"].append(float(reward))
            rec["agent_loc"].append(tuple(game.agent_loc))
            rec["orientation"].append(int(game.orientation))
            rec["game_over"].append(bool(game.game_over))
            rec["points"].append(int(old_value))
            comp, poss = game.performance_ratio()
            rec["perf_completed"].append(comp)
            rec["perf_possible"].append(poss)
            if game.game_over:
                actions = actions[:t + 1]
                break
        out[name + "/actions"] = np.array(actions)
        out[name + "/obs0"] = obs0.astype(np.uint8)
        for k, v in rec.items():
            out[name + "/" + k] = np.array(v)
        print(f"{name}: {len(actions)} steps, game_over={rec['game_over'][-1]}, "
              f"total_reward={sum(rec['reward']):.1f}")

    # Observation fixtures at both view sizes, incl. view larger than board.
    game = load_level("benchmarks/v1.0/append-still.npz", 3)
    game.revert()
    game.update_exit_colors()
    out["obs/board"] = game.board.copy()
    out["obs/goals"] = game.goals.copy()
    out["obs/agent_loc"] = np.array(game.agent_loc)
    out["obs/view15"] = get_obs(game, (15, 15)).astype(np.uint8)
    out["obs/view33"] = get_obs(game, (33, 33)).astype(np.uint8)
    out["obs/view25"] = get_obs(game, (25, 25)).astype(np.uint8)

    np.savez_compressed(os.path.join(OUT, "episodes.npz"), **out)
    print("wrote episodes.npz")


def gen_toggle_fixtures():
    """VERDICT r3 #5(a): episodes with can_toggle_powers / can_toggle_colors
    enabled, on a board rich in indestructible powered cells (fountain,
    ice cube, parasite, weed, spawner) — the reference's power/color
    absorption branch (safelife_game.py:374-393) under fixed seeds."""
    base = np.zeros((14, 14), np.uint16)
    base[3, 3] = CellTypes.fountain | CellTypes.color_b
    base[3, 10] = CellTypes.ice_cube
    base[10, 3] = CellTypes.parasite | CellTypes.color_r
    base[10, 10] = CellTypes.weed | CellTypes.color_g
    base[6, 9] = CellTypes.spawner | CellTypes.color_g
    base[2, 6] = CellTypes.hard_spawner | CellTypes.color_r
    base[5, 5] = CellTypes.life | CellTypes.color_r
    base[8, 5:8] = CellTypes.life
    base[12, 6] = CellTypes.wall | CellTypes.color_b  # indestructible, colored
    base[7, 7] = CellTypes.player
    goals = np.zeros((14, 14), np.uint16)
    goals[4:7, 4:7] = CellTypes.color_b

    out = {}
    for name, (tp, tc) in {
        "powers": (True, False),
        "colors": (False, True),
        "both": (True, True),
    }.items():
        game = SafeLifeGame(board_size=(14, 14))
        game.deserialize({
            "board": base.copy(), "goals": goals.copy(),
            "agent_loc": (7, 7), "orientation": 1,
            "min_performance": -1.0, "spawn_prob": 0.3,
        })
        game.can_toggle_powers = tp
        game.can_toggle_colors = tc
        game.update_exit_colors()
        speedups.seed(63)
        actions = random.Random(29).choices(range(9), k=140)
        old_value = game.current_points()

        rec = {k: [] for k in ("board", "goals", "reward", "agent_loc",
                               "orientation", "game_over", "points",
                               "perf_completed", "perf_possible")}
        out[name + "/init_board"] = game.board.copy()
        out[name + "/init_goals"] = game.goals.copy()
        out[name + "/init_agent_loc"] = np.array(game.agent_loc)
        out[name + "/init_orientation"] = np.int64(game.orientation)
        out[name + "/min_performance"] = np.float64(game.min_performance)
        out[name + "/spawn_prob"] = np.float64(game.spawn_prob)
        out[name + "/init_points"] = np.int64(old_value)
        out[name + "/can_toggle_powers"] = np.bool_(tp)
        out[name + "/can_toggle_colors"] = np.bool_(tc)

        for t, a in enumerate(actions):
            reward, old_value = env_step(game, a, old_value)
            rec["board"].append(game.board.copy())
            rec["goals"].append(game.goals.copy())
            rec["reward"].append(float(reward))
            rec["agent_loc"].append(tuple(game.agent_loc))
            rec["orientation"].append(int(game.orientation))
            rec["game_over"].append(bool(game.game_over))
            rec["points"].append(int(old_value))
            comp, poss = game.performance_ratio()
            rec["perf_completed"].append(comp)
            rec["perf_possible"].append(poss)
            if game.game_over:
                actions = actions[:t + 1]
                break
        out[name + "/actions"] = np.array(actions)
        for k, v in rec.items():
            out[name + "/" + k] = np.array(v)
        print(f"toggle-{name}: {len(actions)} steps, "
              f"total_reward={sum(rec['reward']):.1f}")
    np.savez_compressed(os.path.join(OUT, "toggles.npz"), **out)
    print("wrote toggles.npz")


def gen_puzzle_fixtures():
    """Hand-authored puzzle levels: movables (push/pull), fragile patterns,
    spawner chaos — the full cell-type vocabulary (BASELINE config 2)."""
    puzzles = [
        "01 - Corridor", "02 - Block", "08 - Breakout", "10 - Pruning",
        "16 - Chaos contained", "18 - Inside out",
    ]
    out = {}
    for pname in puzzles:
        game = load_single(os.path.join("puzzles", pname + ".npz"))
        game.revert() if hasattr(game, "_init_data") else None
        game.update_exit_colors()
        speedups.seed(31)
        actions = random.Random(13).choices(range(9), k=100)
        old_value = game.current_points()
        name = pname.split(" - ")[-1].lower().replace(" ", "-")

        rec = {k: [] for k in ("board", "goals", "reward", "agent_loc",
                               "orientation", "game_over", "points",
                               "perf_completed", "perf_possible")}
        out[name + "/init_board"] = game.board.copy()
        out[name + "/init_goals"] = game.goals.copy()
        out[name + "/init_agent_loc"] = np.array(game.agent_loc)
        out[name + "/init_orientation"] = np.int64(game.orientation)
        out[name + "/min_performance"] = np.float64(game.min_performance)
        out[name + "/spawn_prob"] = np.float64(game.spawn_prob)
        out[name + "/init_points"] = np.int64(old_value)
        out[name + "/obs0"] = get_obs(game).astype(np.uint8)

        for t, a in enumerate(actions):
            reward, old_value = env_step(game, a, old_value)
            rec["board"].append(game.board.copy())
            rec["goals"].append(game.goals.copy())
            rec["reward"].append(float(reward))
            rec["agent_loc"].append(tuple(game.agent_loc))
            rec["orientation"].append(int(game.orientation))
            rec["game_over"].append(bool(game.game_over))
            rec["points"].append(int(old_value))
            comp, poss = game.performance_ratio()
            rec["perf_completed"].append(comp)
            rec["perf_possible"].append(poss)
            if game.game_over:
                actions = actions[:t + 1]
                break
        out[name + "/actions"] = np.array(actions)
        for k, v in rec.items():
            out[name + "/" + k] = np.array(v)
        print(f"{name}: {len(actions)} steps, "
              f"total_reward={sum(rec['reward']):.1f}")
    np.savez_compressed(os.path.join(OUT, "puzzles.npz"), **out)
    print("wrote puzzles.npz")


if __name__ == "__main__":
    gen_ca_fixtures()
    gen_episode_fixtures()
    gen_toggle_fixtures()
    gen_puzzle_fixtures()
