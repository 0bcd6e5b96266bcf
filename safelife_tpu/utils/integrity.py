"""Silent-corruption detection for the accelerator compute path.

Motivation (observed incident, 2026-08-17): as this project's remote TPU
pool degraded toward a full outage, jitted programs kept executing *at
normal speed* but returned wrong values for part of the computation —
the goal-scoring select-chain came back all-zero while the CA advance,
episode machinery and side-effect counts stayed correct.  Training runs
in that window logged fabricated rewards (for prune tasks a zero score
reads as "everything completed", i.e. performance 1.0 from the very
first random-policy episode).  Nothing crashed; only downstream analysis
caught it.

Defense: golden self-checks.  A fixture of rich random boards is built
on the HOST, every checked quantity is precomputed with the independent
numpy twins (``ops.scoring.*_np``, ``ops.life_numpy``), and
:func:`check_device_integrity` reruns them through the real jitted device
ops — the CA advance, the point/performance/possible scoring chains, the
side-effect count, and the actual one-hot MXU reset gather
(``env.state.onehot_take``) over full-range uint16 values —
comparing bit-for-bit.  The gather check also catches *precision*
regressions, not just hardware faults: a second observed incident
(2026-08-19) had the default-precision MXU path bf16-round gather inputs,
stripping ALIVE bits from every reset board while everything else stayed
exact.  Any mismatch raises :class:`DeviceIntegrityError`
with a field-by-field report.  The trainer runs this at startup, at every
checkpoint/eval, and at the end of training (see ``training/driver.py``),
so a run that trained through silent corruption cannot finish quietly;
``bench.py`` and ``python -m safelife_tpu selftest`` expose the same
check operationally.

Exact comparisons are sound because every checked op is integer-valued:
the env math is uint16/int32 throughout, and the gather is a one-hot
selection of u16 values pinned to HIGHEST matmul precision (each output
a single f32-exact product), so a single flipped, dropped, or *rounded*
lane anywhere fails loudly.  :func:`check_bank_reset_integrity`
additionally runs the gather over a real bank's own values end to end.
Cost: one tiny compile the first time (cached), ~ms per check after.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import cells as C


class DeviceIntegrityError(RuntimeError):
    """The accelerator returned values that disagree with host goldens."""


_B, _H, _W = 128, 26, 26
_FLAGS = np.array(
    [C.ALIVE, C.AGENT, C.PUSHABLE, C.DESTRUCTIBLE, C.FROZEN,
     C.PRESERVING, C.INHIBITING, C.EXIT,
     C.COLOR_R, C.COLOR_G, C.COLOR_B, C.PULLABLE], dtype=np.uint16)

_fixture_cache = {}


def _soup(rng, shape, density=0.15):
    board = np.zeros(shape, np.uint16)
    for f in _FLAGS:
        board |= f * (rng.random(shape) < density).astype(np.uint16)
    return board


def _build_fixture():
    """Host-side inputs + expected outputs for every checked device op."""
    from ..ops import life_numpy, scoring

    rng = np.random.RandomState(20260817)
    board = _soup(rng, (_H, _W, _B))
    goals = _soup(rng, (_H, _W, _B), density=0.1)
    init_board = _soup(rng, (_H, _W, _B))
    baseline = rng.randint(-8, 9, _B).astype(np.int32)

    # CA advance golden: spawner-free fixture + no spawn field, so the
    # advance is deterministic and the numpy oracle is exact.
    adv = np.stack([life_numpy.advance_board_reference(
        board[..., i], rand_field=np.ones((_H, _W)))
        for i in range(_B)], axis=-1)

    # Scoring goldens via the independent numpy twins.
    pts = scoring.current_points_np(
        np.moveaxis(board, -1, 0), np.moveaxis(goals, -1, 0))
    perf = scoring.performance_score_np(
        np.moveaxis(board, -1, 0), np.moveaxis(goals, -1, 0))
    poss = scoring.possible_score_np(np.moveaxis(goals, -1, 0))

    # Side-effect count golden (numpy re-statement of the op's contract).
    b = board & ~np.uint16(C.PLAYER)
    sb = init_board & ~np.uint16(C.PLAYER)
    exit_mask = (init_board & C.EXIT) != 0
    b = np.where(exit_mask, sb, b)
    red = np.uint16(C.ALIVE | C.COLOR_R)
    non = ((b == sb)
           | (((sb & red) == red) & ((b & red) != red))
           | (((goals & C.COLORS) == C.COLOR_B) & ((b & red) == C.ALIVE)))
    side = (~non).sum((0, 1)).astype(np.int32)

    # Reset-gather golden: run the REAL one-hot MXU gather
    # (env.state.onehot_take — the exact jitted op every in-training and
    # eval reset flows through) over full-range uint16 boards.  A
    # small-integer matmul probe is NOT sufficient here: on 2026-08-19
    # the default-precision MXU path rounded gather inputs to bf16,
    # silently stripping low bits of cell values > 255 (ALIVE bits
    # vanished on reset, fabricating perfect prune scores) while a
    # small-integer probe stayed exact.  Full-range values catch any
    # precision regression on this path bit-for-bit.
    gather_src = rng.randint(0, 1 << 16, (_H, _W, 100)).astype(np.uint16)
    gather_idx = rng.randint(0, 100, _B).astype(np.int32)
    gather_exp = gather_src[..., gather_idx]

    return dict(board=board, goals=goals, init_board=init_board,
                baseline=baseline, gather_src=gather_src,
                gather_idx=gather_idx,
                expected=dict(adv=adv, points=pts, completed=perf - baseline,
                              possible=poss - baseline, side=side,
                              gather=gather_exp))


@jax.jit
def _device_outputs(board, goals, init_board, baseline, gather_src,
                    gather_idx):
    from ..env.state import onehot_take
    from ..ops import life, scoring

    adv = life.advance_board(board, jnp.zeros(board.shape, bool))
    completed, possible = scoring.performance_ratio(board, goals, baseline)
    return dict(
        adv=adv,
        points=scoring.current_points(board, goals),
        completed=completed,
        possible=possible,
        side=scoring.side_effect_count(board, init_board, goals),
        gather=onehot_take(gather_src, gather_idx))


def check_device_integrity(raise_on_fail=True):
    """Compare the jitted device ops against host goldens.

    Returns True when everything matches; on mismatch raises
    :class:`DeviceIntegrityError` (or returns False with
    ``raise_on_fail=False``).  Disabled entirely by ``SAFELIFE_INTEGRITY=0``.
    """
    if os.environ.get("SAFELIFE_INTEGRITY", "1") == "0":
        return True
    if "fixture" not in _fixture_cache:
        _fixture_cache["fixture"] = _build_fixture()
    fx = _fixture_cache["fixture"]
    out = jax.device_get(_device_outputs(
        jnp.asarray(fx["board"]), jnp.asarray(fx["goals"]),
        jnp.asarray(fx["init_board"]), jnp.asarray(fx["baseline"]),
        jnp.asarray(fx["gather_src"]), jnp.asarray(fx["gather_idx"])))
    bad = []
    for k, want in fx["expected"].items():
        got = np.asarray(out[k])
        if not np.array_equal(got, np.asarray(want)):
            n = int((got != np.asarray(want)).sum())
            bad.append(f"{k}: {n}/{got.size} values wrong "
                       f"(e.g. got {got.reshape(-1)[0]!r} "
                       f"want {np.asarray(want).reshape(-1)[0]!r})")
    if bad:
        msg = ("device integrity check FAILED on "
               f"{jax.devices()[0].device_kind}: " + "; ".join(bad)
               + " — the accelerator is returning silently-wrong results"
                 " (degrading pool?); results from this process are not"
                 " trustworthy.")
        if raise_on_fail:
            raise DeviceIntegrityError(msg)
        import logging
        logging.getLogger(__name__).error(msg)
        return False
    return True


def check_bank_reset_integrity(bank, sample=8, raise_on_fail=True):
    """End-to-end reset-gather check on a REAL level bank.

    Gathers ``sample`` levels through the very ``take_onehot`` the env
    resets with (on device) and compares every leaf bit-for-bit against a
    host numpy trailing-axis take of the same bank.  Complements the
    fixture check in :func:`check_device_integrity`: the fixture probe is
    its own compiled program, and XLA may simplify a small standalone
    one-hot matmul into an exact gather while the env-sized program still
    hits the lossy MXU path — checking the actual bank values through the
    actual method closes that gap (2026-08-19 incident; see
    env/state.py:onehot_take).
    """
    if os.environ.get("SAFELIFE_INTEGRITY", "1") == "0":
        return True
    idx = np.linspace(0, bank.num_levels - 1, sample).astype(np.int32)
    dev = jax.device_get(jax.jit(bank.take_onehot)(jnp.asarray(idx)))
    host = jax.tree.map(lambda x: np.asarray(x)[..., idx], bank)
    dev_leaves, _ = jax.tree.flatten(dev)
    host_leaves, _ = jax.tree.flatten(host)
    bad = [f"leaf {i}: {int((np.asarray(d) != np.asarray(h)).sum())} wrong"
           for i, (d, h) in enumerate(zip(dev_leaves, host_leaves))
           if not np.array_equal(np.asarray(d), np.asarray(h))]
    if bad:
        msg = ("bank reset-gather integrity FAILED on "
               f"{jax.devices()[0].device_kind}: " + "; ".join(bad)
               + " — level state is corrupted at reset; aborting.")
        if raise_on_fail:
            raise DeviceIntegrityError(msg)
        import logging
        logging.getLogger(__name__).error(msg)
        return False
    return True
