"""Level loading: npz archives / single levels -> device-resident banks.

Capability parity with ``safelife/file_finder.py`` (find_files/_load_files/
safelife_loader), redesigned for lockstep batching: instead of yielding one
``SafeLifeGame`` object at a time, levels are stacked into a
:class:`~safelife_tpu.env.state.LevelBank` that lives on device, and resets
index into it with no host round-trip.

Supported file formats (wire-compatible with the reference):
  * combined archives: ``{"levels": structured_array}`` with fields
    ``spawn_prob, orientation, agent_loc, board, class, min_performance,
    goals, name`` (benchmarks/v1.0/*.npz),
  * single-level npz files with those fields as separate arrays,
  * procgen YAML parameter files (dispatched to safelife_tpu.procgen).

Search order for bare names: cwd, ``$SAFELIFE_LEVELS`` (a colon-separated
list of extra level directories), then the packaged data dir
(``safelife_tpu/levels/data`` — regenerate it with
``python -m safelife_tpu gen-benchmarks``).
"""

import glob
import os

import numpy as np
import jax.numpy as jnp

from .. import cells as C
from ..env.state import LevelBank

_HERE = os.path.dirname(os.path.abspath(__file__))
PACKAGED_LEVELS = os.path.join(_HERE, "data")

FILE_TYPES = ("npz", "yaml", "json")


def level_directories():
    env_dirs = os.environ.get("SAFELIFE_LEVELS", "")
    dirs = [d for d in env_dirs.split(os.pathsep) if d]
    dirs.append(PACKAGED_LEVELS)
    return dirs


def find_files(*paths, file_types=FILE_TYPES):
    """Resolve level paths: direct, globbed, extensionless, or directories,
    searching the cwd first and the level directories as fallback."""
    for path in paths:
        found = _find_one(os.path.expanduser(path), file_types)
        if not found:
            for base in level_directories():
                found = _find_one(os.path.join(base, path), file_types)
                if found:
                    break
        if not found:
            raise FileNotFoundError(f"No level files found for '{path}'")
        yield from found


def _find_one(path, file_types):
    def ok(p):
        return os.path.isfile(p) and p.rsplit(".", 1)[-1] in file_types

    hits = sorted(filter(ok, glob.glob(path, recursive=True)))
    if hits:
        return hits
    for ext in file_types:
        hits = sorted(filter(ok, glob.glob(path + "." + ext, recursive=True)))
        if hits:
            return hits
    if os.path.isdir(path):
        hits = sorted(
            p for p in glob.glob(os.path.join(path, "*")) if ok(p))
        return hits
    return []


def _level_from_record(rec, name):
    """Normalize one level record to a plain dict of numpy arrays."""
    board = np.ascontiguousarray(rec["board"], np.uint16)
    goals = np.ascontiguousarray(rec["goals"], np.uint16)
    agent_loc = np.asarray(rec["agent_loc"])  # (x, y) order in the wire format
    return dict(
        board=board,
        goals=goals,
        agent_col=np.int32(agent_loc[0]),
        agent_row=np.int32(agent_loc[1]),
        orientation=np.int32(rec["orientation"]) if "orientation" in _fields(rec) else np.int32(1),
        spawn_prob=np.float32(rec["spawn_prob"]) if "spawn_prob" in _fields(rec) else np.float32(0.3),
        min_performance=np.float32(rec["min_performance"]) if "min_performance" in _fields(rec) else np.float32(-1.0),
        name=str(name),
    )


def _fields(rec):
    if hasattr(rec, "dtype") and rec.dtype.fields:
        return rec.dtype.fields
    return rec.keys() if hasattr(rec, "keys") else ()


def load_levels(*paths):
    """Load all matching files into a list of level dicts (host numpy)."""
    levels = []
    for fname in find_files(*paths):
        if fname.endswith((".yaml", ".json")):
            raise ValueError(
                f"'{fname}' holds procgen parameters; use "
                "safelife_tpu.procgen.gen_levels / level_stream for these.")
        with np.load(fname) as data:
            if "levels" in data:
                for rec in data["levels"]:
                    name = os.path.join(
                        os.path.basename(fname)[:-4], str(rec["name"]))
                    levels.append(_level_from_record(rec, name))
            else:
                rec = {k: data[k] for k in data.files}
                levels.append(_level_from_record(
                    rec, os.path.basename(fname)[:-4]))
    return levels


def build_bank(levels, max_exits=4):
    """Stack uniform-shape level dicts into a device LevelBank.

    Precomputes every reset-time quantity that is a pure function of the
    level (exit locations, baseline/initial scores, reset exit gate) so
    in-jit auto-resets are plain gathers.
    """
    from ..env.state import find_exits_np
    from ..ops import scoring

    if not levels:
        raise ValueError("No levels to build a bank from.")
    shapes = {lv["board"].shape for lv in levels}
    if len(shapes) > 1:
        raise ValueError(
            f"Levels of mixed board shapes {shapes} cannot share a bank "
            "(torus dynamics depend on the shape). Group them with "
            "group_by_shape() first.")
    stack = lambda key: jnp.asarray(
        np.stack([lv[key] for lv in levels], axis=-1))

    from ..ops import life_numpy

    # Trim the exit table to the bank's REAL maximum (>= 1 slot): every
    # exit slot costs the fused obs path a masked board reduction (dynamic
    # goals) or a perimeter write per step, and SafeLife levels carry
    # exactly one exit (proc_gen.py places one; the shipped archives all
    # have <= 1), so the default 4-slot table wastes 3/4 of that work.
    n_exits = max(int(((lv["board"] & C.EXIT) != 0).sum()) for lv in levels)
    max_exits = max(1, min(max_exits, n_exits))
    exits = [find_exits_np(lv["board"], max_exits) for lv in levels]
    exit_gcol = [
        np.where(e[2], (lv["goals"][e[0], e[1]].astype(np.int32)
                        >> C.COLOR_BIT) & 7, 0)
        for lv, e in zip(levels, exits)]
    # Goals are "static" when advancing them is the identity for every
    # level (no spawners, CA fixed point) — lets the env skip the goals
    # advance entirely.
    static_goals = all(
        not (lv["goals"] & C.SPAWNING).any()
        and np.array_equal(
            life_numpy.advance_board_reference(
                lv["goals"], 0.0, rand_field=np.ones(lv["goals"].shape)),
            lv["goals"])
        for lv in levels)
    board_np = np.stack([lv["board"] for lv in levels], axis=-1)
    goals_np = np.stack([lv["goals"] for lv in levels], axis=-1)
    # numpy scoring twins reduce over the last two axes; ours are (H, W, N),
    # so move the level axis first.
    b_nf = np.moveaxis(board_np, -1, 0)
    g_nf = np.moveaxis(goals_np, -1, 0)
    baseline = scoring.performance_score_np(b_nf, g_nf).astype(np.int32)
    possible0 = (scoring.possible_score_np(g_nf).astype(np.int32) - baseline)
    points0 = scoring.current_points_np(b_nf, g_nf).astype(np.int32)
    min_perf = np.stack([lv["min_performance"] for lv in levels])
    can_exit0 = (min_perf < 0) | (0 >= min_perf * possible0)

    spawnless = not ((board_np & C.SPAWNING).any()
                     or (goals_np & C.SPAWNING).any())

    # "Simple" goal boards let the fused step run the collapsed B3/S23
    # goal advance (ops/life_pallas._advance_goals_simple).  The
    # conditions are inductive under the CA rule, so checking the initial
    # goal boards certifies every reachable state.
    forbidden = C.PRESERVING | C.INHIBITING | C.SPAWNING | C.EXIT
    simple_goals = not bool((goals_np & forbidden).any())
    # Weaker certification: spawners allowed on goals, but no PRESERVING/
    # INHIBITING/EXIT — the fused step then advances the pair with two
    # packed stencils instead of three (see LevelBank.spawn_simple_goals).
    spawn_simple = not bool(
        (goals_np & (C.PRESERVING | C.INHIBITING | C.EXIT)).any())

    return LevelBank(
        spawnless=bool(spawnless),
        simple_goals=simple_goals,
        spawn_simple_goals=spawn_simple,
        board=jnp.asarray(board_np),
        goals=jnp.asarray(goals_np),
        agent_row=stack("agent_row"),
        agent_col=stack("agent_col"),
        orientation=stack("orientation"),
        spawn_prob=stack("spawn_prob"),
        min_performance=stack("min_performance"),
        exit_row=jnp.asarray(np.stack([e[0] for e in exits], axis=-1)),
        exit_col=jnp.asarray(np.stack([e[1] for e in exits], axis=-1)),
        exit_valid=jnp.asarray(np.stack([e[2] for e in exits], axis=-1)),
        exit_gcol=jnp.asarray(np.stack(exit_gcol, axis=-1)),
        baseline_score=jnp.asarray(baseline),
        possible0=jnp.asarray(possible0),
        points0=jnp.asarray(points0),
        can_exit0=jnp.asarray(can_exit0),
        static_goals=bool(static_goals),
    )


def group_by_shape(levels):
    """Split a mixed list of levels into shape -> list of levels."""
    groups = {}
    for lv in levels:
        groups.setdefault(lv["board"].shape, []).append(lv)
    return groups


def load_bank(*paths):
    """One-call convenience: find, load and stack levels into a bank."""
    return build_bank(load_levels(*paths))


def level_names(*paths):
    return [lv["name"] for lv in load_levels(*paths)]
