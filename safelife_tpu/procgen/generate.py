"""Procedural level generation (Python orchestration).

Capability parity with ``safelife/proc_gen.py``: Dirichlet-process board
partitioning, fence construction, recursive parameter randomization
(``choices`` / ``uniform``), layered region painting (fences, spawners,
tree lattices, annealed patterns, movable walls/trees, hardened life,
buffer zones, fountains, board-vs-goals targeting), top-level ``gen_game``
(partition -> player + farthest exit -> regions -> white buffer goals) and
``stability_mask``.  The annealing pattern synthesizer and toroidal
labeling run in the native C++ core (:mod:`safelife_tpu.procgen.native`).
"""

import logging

import numpy as np
from scipy import ndimage, signal

from .. import cells as C
from ..cells import COLOR_NAMES
from ..game import SafeLifeGame
from . import native
from .native import (
    NEW_CELL_MASK, CAN_OSCILLATE_MASK, INCLUDE_VIOLATIONS_MASK)

logger = logging.getLogger(__name__)


def coinflip(p, shape=None):
    """Bernoulli(p) samples (reference helper_utils.coinflip)."""
    return np.random.random(shape) < p


def fix_random_values(val):
    """Recursively resolve {'choices': ...} / {'uniform': [lo, hi]} nodes
    (reference proc_gen._fix_random_values)."""
    if not isinstance(val, dict):
        return val
    if "choices" in val:
        choices = val["choices"]
        if isinstance(choices, list):
            keys, weights = choices, np.ones(len(choices))
        elif isinstance(choices, dict):
            keys = list(choices.keys())
            weights = np.array(list(choices.values()), float)
        else:
            raise ValueError("'choices' must be a list or a dict of weights")
        if (weights < 0).any() or weights.sum() <= 0:
            raise ValueError("choice weights must be non-negative, sum > 0")
        return keys[np.random.choice(len(keys), p=weights / weights.sum())]
    if "uniform" in val:
        low, high = np.array(val["uniform"])
        return (low + (high - low) * np.random.random()).tolist()
    return {key: fix_random_values(v) for key, v in val.items()}


def make_partitioned_regions(shape, alpha=1.0, max_regions=5, min_regions=2):
    """Grow distinct regions with >= 2-cell separation via a Dirichlet
    process (reference proc_gen.make_partioned_regions): cells join an
    existing region with probability proportional to its perimeter, or seed
    a new region with weight ``alpha`` while fewer than ``max_regions``
    exist.  Returns an int board; 0 marks the buffer between regions."""
    ring = np.ones((3, 3), np.int16)
    ring[1, 1] = 0
    adjacent = np.array([[-1, 0], [0, -1], [0, 1], [1, 0]], np.int16)
    near = np.meshgrid([-2, -1, 0, 1, 2], [-2, -1, 0, 1, 2])

    board = np.zeros(shape, np.int16)
    perimeters = [{(i, j) for i in range(shape[0]) for j in range(shape[1])}]
    exclusions = [set()]
    while sum(len(p) for p in perimeters) > 0:
        weights = np.array([len(p) for p in perimeters], float)
        weights[0] = min(alpha, weights[0]) \
            if len(weights) <= max_regions else 1e-10
        if len(weights) <= min_regions:
            weights[1:] = 1e-10
        weights /= weights.sum()
        k = np.random.choice(len(perimeters), p=weights)
        plist = list(perimeters[k])
        i, j = plist[np.random.randint(len(plist))]
        perimeters[0].discard((i, j))
        perimeters[k].discard((i, j))
        if (i, j) in exclusions[k]:
            continue
        exclusions[0].add((i, j))
        exclusions[k].add((i, j))
        # Look at the 5x5 neighborhood: adding here must not bring two
        # different regions within two cells of each other.
        b = board[(i + near[0]) % shape[0], (j + near[1]) % shape[1]]
        b[2, 2] = k or -1
        num_neighbors = signal.convolve2d(b != 0, ring, mode="valid")
        num_foreign = signal.convolve2d((b > 0) & (b != k), ring,
                                        mode="valid")
        if ((num_foreign > 0) & (num_neighbors > 2)).any() \
                or num_foreign[1, 1] > 0:
            continue
        if k == 0:
            k = len(perimeters)
            perimeters.append(set())
            exclusions.append(set())
        board[i, j] = k
        for i2, j2 in (adjacent + (i, j)) % shape:
            if board[i2, j2] == 0:
                perimeters[k].add((i2, j2))
    return board


def build_fence(mask, shuffle=True):
    """Wall in the unmasked regions so that life can't escape (reference
    proc_gen.build_fence: an add pass then a removal pass over edge cells,
    keyed on free-neighbor counts)."""
    mask = np.asarray(mask).astype(np.int32)
    _i = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], np.int32)
    _j = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], np.int32)
    neighbors = ndimage.convolve(mask, np.ones((3, 3)), mode="wrap")
    fence = np.zeros_like(mask)
    edge_i, edge_j = np.nonzero(mask * neighbors % 9)
    neighbors *= 1 - mask
    if edge_i.size == 0:
        return fence

    if shuffle:
        k = np.random.permutation(len(edge_i))
        edge_i, edge_j = edge_i[k], edge_j[k]
    for i, j in zip(edge_i, edge_j):
        n_i = (i + _i) % mask.shape[0]
        n_j = (j + _j) % mask.shape[1]
        if (neighbors[n_i, n_j] >= 3).any():
            neighbors[n_i, n_j] -= 1
            fence[i, j] += 1

    fence_i, fence_j = np.nonzero(fence)
    if shuffle:
        k = np.random.permutation(len(fence_i))
        fence_i, fence_j = fence_i[k], fence_j[k]
    for i, j in zip(fence_i, fence_j):
        n_i = (i + _i) % mask.shape[0]
        n_j = (j + _j) % mask.shape[1]
        if (neighbors[n_i, n_j] < 2).all():
            neighbors[n_i, n_j] += 1
            fence[i, j] -= 1

    return fence


def _gen_pattern(board, mask, seeds=None, num_retries=10, **kwargs):
    """Retry wrapper around the native annealer with min/max-fill adaptation
    (reference proc_gen._gen_pattern)."""
    min_fill = kwargs.setdefault("min_fill", 0.2)
    max_fill = kwargs.pop("max_fill", min_fill * 2)
    try:
        new_board = native.gen_pattern(board, mask, seeds=seeds, **kwargs)
    except native.InsufficientAreaException:
        return board
    except native.MaxIterException:
        if num_retries > 0:
            kwargs["min_fill"] = min_fill * 0.94
            kwargs["max_fill"] = max_fill
            return _gen_pattern(board, mask, seeds, num_retries - 1, **kwargs)
        logger.debug("gen_pattern did not converge; no patterns added")
        return board
    except native.BoardGenException:
        return board
    working = mask & NEW_CELL_MASK
    fill_ratio = np.sum((new_board != 0) * (working > 0)) / \
        max(np.sum(working > 0), 1)
    if fill_ratio > max_fill:
        if num_retries > 0:
            kwargs["max_fill"] = 1.07 * max_fill
            return _gen_pattern(board, mask, seeds, num_retries - 1, **kwargs)
        logger.debug("gen_pattern overfull; no patterns added")
        return board
    return new_board


def _make_lattice(h, w, col_skip, row_skip, stagger):
    rows = np.arange(h)[:, None]
    cols = np.arange(w)[None, :]
    return (rows % row_skip < 1) & (
        (cols + (rows // row_skip) * stagger) % col_skip < 1)


def populate_region(mask, layer_params):
    """Paint one isolated region layer by layer (reference
    proc_gen.populate_region; see that docstring / the yaml files for the
    per-layer parameter vocabulary).  Returns (board, goals)."""
    border = ndimage.maximum_filter(mask, size=3, mode="wrap") ^ mask
    gen_mask = mask * (NEW_CELL_MASK | CAN_OSCILLATE_MASK
                       | INCLUDE_VIOLATIONS_MASK) \
        + border * INCLUDE_VIOLATIONS_MASK
    gen_mask = gen_mask.astype(np.int32)
    board = np.zeros(mask.shape, np.uint16)
    foreground = np.zeros(mask.shape, bool)
    background = np.zeros(mask.shape, bool)
    background_color = np.zeros(mask.shape, bool)
    seeds = None
    max_period = 1

    for layer in layer_params:
        if not isinstance(layer, dict):
            raise ValueError("layer_params must be a list of dicts")
        layer = fix_random_values(layer)
        old_board = board.copy()
        gen_mask0 = gen_mask.copy()
        interior = ndimage.minimum_filter(
            (gen_mask & NEW_CELL_MASK) > 0, size=3, mode="wrap")
        color = np.uint16(COLOR_NAMES.get(layer.get("color"), 0))

        fence_frac = layer.get("fences", 0.0)
        if fence_frac > 0:
            fences = build_fence(gen_mask & NEW_CELL_MASK)
            fences *= coinflip(fence_frac, fences.shape)
            gen_mask &= ~(fences * (NEW_CELL_MASK | CAN_OSCILLATE_MASK))
            board += fences.astype(np.uint16) * np.uint16(C.WALL)

        spawners = layer.get("spawners", 0)
        if spawners > 0:
            _mask = ((gen_mask0 & NEW_CELL_MASK) > 0) & interior
            new_cells = _mask & coinflip(spawners, board.shape)
            if not new_cells.any() and _mask.any():
                i, j = np.nonzero(_mask)
                k = np.random.choice(len(i))  # ensure at least one spawner
                new_cells[i[k], j[k]] = True
            gen_mask[new_cells] ^= NEW_CELL_MASK
            board[new_cells] = C.SPAWNER + color

        tree_lattice = layer.get("tree_lattice")
        if tree_lattice is not None:
            # A lattice of trees spread through the region makes disrupted
            # cells grow chaotically instead of collapsing.
            if not isinstance(tree_lattice, dict):
                tree_lattice = {}
            h, w = board.shape
            stagger = tree_lattice.get("stagger", True)
            spacing = float(tree_lattice.get("spacing", 5))
            if not stagger:
                new_cells = _make_lattice(h, w, spacing, spacing, 0)
            elif spacing <= 3:
                new_cells = _make_lattice(h, w, 3, 3, 1)
            elif spacing == 4:
                new_cells = _make_lattice(h, w, 10, 1, 3)
            elif spacing == 5:
                new_cells = _make_lattice(h, w, 13, 1, 5)
            else:
                new_cells = _make_lattice(h, w, 6, 3, 3)
            new_cells &= (gen_mask & NEW_CELL_MASK) > 0
            board[new_cells] = C.TREE + color

        period = 1
        if "pattern" in layer:
            pattern_args = dict(layer["pattern"])
            period = pattern_args.get("period", 1)
            if period == 1:
                gen_mask2 = gen_mask & ~CAN_OSCILLATE_MASK
                pattern_args.update(period=max_period, osc_bonus=0)
            elif period == 0:
                gen_mask2 = gen_mask & ~INCLUDE_VIOLATIONS_MASK
                pattern_args.update(period=max_period, osc_bonus=0)
            elif period < max_period:
                raise ValueError(
                    "Periods for sequential layers must be 0, 1, or >= the "
                    "largest period in prior layers.")
            else:
                gen_mask2 = gen_mask
                max_period = period

            board = _gen_pattern(board, gen_mask2, seeds, **pattern_args)

            # Freeze this layer's pattern against later layers: still cells
            # and oscillating cells (plus the oscillators' neighbors) may
            # not be modified again.
            boards = [board]
            for _ in range(1, max_period):
                boards.append(native.advance_board(boards[-1]))
            non_empty = np.array(boards) != 0
            still_cells = non_empty.all(axis=0)
            osc_cells = still_cells ^ non_empty.any(axis=0)
            osc_neighbors = ndimage.maximum_filter(
                osc_cells, size=3, mode="wrap")
            gen_mask[osc_cells] &= ~(NEW_CELL_MASK | INCLUDE_VIOLATIONS_MASK)
            gen_mask[still_cells | osc_neighbors] &= \
                ~(NEW_CELL_MASK | CAN_OSCILLATE_MASK)

            new_mask = board != old_board
            life_mask = ((board & C.ALIVE) > 0) & new_mask
            board += color * new_mask * life_mask
            # Seeds bias the next layer's patterns to grow nearby.
            seeds = (((board & C.ALIVE) > 0) & mask).astype(np.int32)

        new_mask = board != old_board

        movable_walls = layer.get("movable_walls", 0)
        if movable_walls > 0:
            new_cells = coinflip(movable_walls, board.shape) * new_mask
            new_cells *= (board & ~np.uint16(C.COLORS)) == C.WALL
            board += new_cells * np.uint16(C.MOVABLE)

        movable_trees = layer.get("movable_trees", 0)
        if movable_trees > 0:
            new_cells = coinflip(movable_trees, board.shape) * new_mask
            new_cells *= (board & ~np.uint16(C.COLORS)) == C.TREE
            board += new_cells * np.uint16(C.MOVABLE)

        hardened_life = layer.get("hardened_life", 0)
        if hardened_life > 0:
            new_cells = coinflip(hardened_life, board.shape) * new_mask
            new_cells *= (board & ~np.uint16(C.COLORS)) == C.LIFE
            board -= new_cells * np.uint16(C.DESTRUCTIBLE)

        buffer_size = layer.get("buffer_zone", 0) * 2 + 1
        life_cells = (board & C.ALIVE) > 0
        buf = ndimage.maximum_filter(life_cells, size=buffer_size,
                                     mode="wrap")
        gen_mask[buf] &= ~NEW_CELL_MASK

        target = layer.get("target", "board")
        if target == "board":
            foreground[new_mask] = True
            if period > 0:
                background[new_mask] = True
        elif target == "goals":
            background[new_mask] = True
            background_color[new_mask] = True
            foreground[new_mask & ((board & C.ALIVE) == 0)] = True
        elif target == "both":
            foreground[new_mask] = True
            if period > 0:
                background[new_mask] = True
                background_color[new_mask] = True
        else:
            raise ValueError(f"Unexpected value for 'target': {target}")

        fountains = layer.get("fountains", 0)
        if fountains > 0:
            new_cells = coinflip(fountains, board.shape)
            new_cells *= (gen_mask & NEW_CELL_MASK) > 0
            neighbors = ndimage.maximum_filter(new_cells, size=3, mode="wrap")
            neighbors *= (gen_mask & NEW_CELL_MASK) > 0
            gen_mask[neighbors] = INCLUDE_VIOLATIONS_MASK
            if buffer_size > 1:
                buf = ndimage.maximum_filter(neighbors, size=buffer_size,
                                             mode="wrap")
                gen_mask[buf] &= ~NEW_CELL_MASK
            board[neighbors] = C.WALL + color
            board[new_cells] = C.FOUNTAIN + color
            foreground[new_cells] = True
            background[neighbors] = True
            background_color[neighbors] = True

    goals = board.copy()
    board = board * foreground
    goals = goals * background
    goals &= ~np.uint16(C.SPAWNING)
    goals &= ~(np.uint16(C.COLORS) * ~background_color)
    return board, goals


def gen_game(board_shape=(25, 25), min_performance=-1, partitioning={},
             starting_region=None, later_regions=None, buffer_region=None,
             named_regions={}, **etc):
    """Generate a SafeLifeGame (reference proc_gen.gen_game): partition the
    board, place the player and the farthest exit in the buffer region,
    populate every region, and color the buffer goals white."""
    board_shape = fix_random_values(board_shape)
    min_performance = fix_random_values(min_performance)
    partitioning = fix_random_values(partitioning)

    regions = make_partitioned_regions(tuple(board_shape), **partitioning)
    board = np.zeros(tuple(board_shape), np.uint16)
    goals = np.zeros(tuple(board_shape), np.uint16)

    # Player in the buffer; exit as far from the player as possible.
    zero_reg = regions == 0
    i, j = np.nonzero(zero_reg)
    k1 = np.random.choice(len(i))
    i1, j1 = i[k1], j[k1]
    board[i1, j1] = C.PLAYER
    row_dist = np.abs(np.arange(board_shape[0])[:, None] - i1)
    col_dist = np.abs(np.arange(board_shape[1])[None, :] - j1)
    row_dist = np.minimum(row_dist, board_shape[0] - row_dist)
    col_dist = np.minimum(col_dist, board_shape[1] - col_dist)
    dist = (row_dist + col_dist) * zero_reg
    k2 = int(np.argmax(dist))
    i2, j2 = k2 // board_shape[1], k2 % board_shape[1]
    board[i2, j2] = C.LEVEL_EXIT | C.COLOR_R

    # Keep other regions away from the player and exit.
    n = np.array([[-1, -1, -1], [0, 0, 0], [1, 1, 1]])
    regions[(i1 + n) % board.shape[0], (j1 + n.T) % board.shape[1]] = -1
    regions[(i2 + n) % board.shape[0], (j2 + n.T) % board.shape[1]] = -1

    for k in np.unique(regions)[2:]:
        mask = regions == k
        if starting_region is not None:
            region_name = fix_random_values(starting_region)
        else:
            region_name = fix_random_values(later_regions)
        if region_name not in named_regions:
            logger.error("No region parameters for name '%s'", region_name)
            continue
        rboard, rgoals = populate_region(mask, named_regions[region_name])
        board += rboard
        goals += rgoals
        starting_region = None

    buffer_region = fix_random_values(buffer_region)
    if buffer_region in named_regions:
        rboard, rgoals = populate_region(regions == 0,
                                         named_regions[buffer_region])
        board += rboard
        goals += rgoals

    # White buffer goals: a visual hint for humans.
    buffer_mask = (regions <= 0) & ((goals & C.COLORS) == 0)
    goals[buffer_mask] += np.uint16(C.COLORS)

    game = SafeLifeGame(board_size=None)
    game.deserialize({
        "board": board,
        "goals": goals,
        "agent_loc": (int(j1), int(i1)),
        "min_performance": min_performance,
        "orientation": 1,
    })
    return game


def stability_mask(board, period=6, remove_agent=True):
    """Mark separable regions that are stable with the given period
    (reference proc_gen.stability_mask)."""
    board = np.asarray(board, np.uint16)
    if remove_agent:
        board = board * ((board & C.AGENT) == 0)
    neighborhood = np.ones((3, 3))
    alive = ((board & C.ALIVE) // C.ALIVE).astype(np.int32)
    neighbors = ndimage.convolve(alive, neighborhood, mode="wrap")
    max_neighbors = neighbors
    ever_alive = alive
    orig_board = board
    for _ in range(period):
        board = native.advance_board(board)
        alive = ((board & C.ALIVE) // C.ALIVE).astype(np.int32)
        neighbors = ndimage.convolve(alive, neighborhood, mode="wrap")
        ever_alive = ever_alive | alive
        max_neighbors = np.maximum(max_neighbors, neighbors)
    is_boundary = (board & C.FROZEN) > 0
    is_boundary |= (ever_alive == 0) & (max_neighbors <= 2)
    labels, num_labels = native.wrapped_label(~is_boundary)
    mask = np.zeros(board.shape, bool)
    for idx in range(1, num_labels + 1):
        region = labels == idx
        if (board[region] == orig_board[region]).all():
            mask |= region
    return mask
