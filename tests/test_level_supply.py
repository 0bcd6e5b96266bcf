"""Level iterator, archive utilities, alternative engines, recording."""

import os

import jax
import numpy as np

from safelife_tpu import cells as C
from safelife_tpu.alt_games import AsyncGame, GameOfLife
from safelife_tpu.game import SafeLifeGame
from safelife_tpu.levels import iterator
from safelife_tpu.metrics.recording import record_episode, save_trajectory


def test_loader_static_levels():
    games = list(iterator.safelife_loader(
        "benchmarks/v1.0/append-still.npz", repeat=False, num_workers=0))
    assert len(games) == 100
    assert all(isinstance(g, SafeLifeGame) for g in games)
    assert games[0].board.shape == (26, 26)


def test_loader_procgen_repeat_and_workers():
    gen = iterator.safelife_loader(
        "append-still-easy", num_workers=2, max_queue=2)
    games = [next(gen) for _ in range(3)]
    assert all((g.board & C.AGENT).any() for g in games)
    # procgen with multiple workers reseeds -> boards differ
    assert not np.array_equal(games[0].board, games[1].board) or \
        not np.array_equal(games[1].board, games[2].board)


def test_archive_roundtrip(tmp_path):
    d = os.path.join(str(tmp_path), "levels")
    os.makedirs(d)
    for i in range(3):
        g = SafeLifeGame(board_size=(8, 8))
        g.board[2, 2 + i] = C.LIFE
        g.save(os.path.join(d, f"lvl-{i}.npz"))
    archive = iterator.combine_levels(d)
    with np.load(archive) as data:
        assert len(data["levels"]) == 3
        assert data["levels"]["board"].shape == (3, 8, 8)
    out_dir = iterator.expand_levels(archive)
    files = sorted(os.listdir(out_dir))
    assert len(files) == 3
    g2 = SafeLifeGame.load(os.path.join(out_dir, files[0]))
    assert g2.board.shape == (8, 8)


def test_game_of_life_custom_rules():
    # B1/S: with born_rule=(1,), a single seed explodes
    g = GameOfLife(board_size=(9, 9))
    g.board[:] = 0
    g.board[4, 4] = C.LIFE
    g.born_rule = (1,)
    g.survive_rule = (8,)
    g.advance_board()
    alive = ((g.board & C.ALIVE) != 0).sum()
    assert alive == 8  # ring around the (now dead) seed


def test_async_game_runs():
    np.random.seed(0)
    g = AsyncGame(board_size=(8, 8))
    g.board[:] = 0
    g.board[3:5, 3:5] = C.LIFE
    g.temperature = 0.5
    g.advance_board()
    assert g.num_steps == 1
    assert g.board.shape == (8, 8)


def test_record_episode(tmp_path):
    from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
    from safelife_tpu.levels import synth
    from safelife_tpu import benchmarking as B

    bank = synth.synth_bank(2, h=10, w=10)
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(9, 9), time_limit=15,
                                       auto_reset=False))
    traj = record_episode(env, bank, B.random_policy(),
                          jax.random.PRNGKey(0), max_steps=20)
    assert traj["length"] >= 1
    assert traj["board"].shape[1:] == (10, 10)
    files = save_trajectory(traj, os.path.join(str(tmp_path), "ep0"))
    assert all(os.path.exists(f) for f in files)
    assert files[1].endswith(".gif")


def test_gen_benchmarks_cli(tmp_path):
    """End-to-end archive authoring: procgen task -> frozen suite."""
    from safelife_tpu.levels.iterator import gen_benchmarks
    outs = gen_benchmarks(str(tmp_path), tasks=["append-still-easy"],
                          num_levels=3, num_workers=0)
    assert len(outs) == 1
    with np.load(outs[0]) as data:
        levels = data["levels"]
        assert len(levels) == 3
        assert (levels["board"] & C.AGENT).any(axis=(1, 2)).all()
    # the generated archive round-trips through the bank loader
    from safelife_tpu.levels.loader import load_bank
    bank = load_bank(outs[0])
    assert bank.num_levels == 3
