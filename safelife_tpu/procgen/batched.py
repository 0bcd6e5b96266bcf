"""On-device batched pattern synthesis: B annealing chains in lockstep.

The reference's pattern generator is an inherently sequential simulated
annealer with incremental violation bookkeeping (``gen_board.c``; our C++
port in :mod:`safelife_tpu.procgen.native`).  The batched TPU redesign runs
one proposal round for EVERY board per iteration:

  1. one full-board violation field (``advance(board) != board`` — a single
     fused convolution) drives Gumbel-max sampling of a target cell per
     board (violating cells first; any in-mask cell when under-filled),
  2. a 7x7 patch around each target is gathered (cell flips only affect
     violations within +-2, so the patch holds every needed neighbor),
  3. all 27 candidates (3 alternative cell types x the 3x3 neighborhood,
     the reference's extended-neighborhood proposal set) are scored on the
     patch — tiny (7, 7, B) arithmetic — with the reference's
     density-dependent type and fill penalties,
  4. one Boltzmann pick per board is scattered back; converged boards
     (violation-free and filled) freeze.

Distribution note: the proposal scoring is distribution-IDENTICAL to the
reference's "cumulative" type-cycle bookkeeping (gen_board.c:438-455).
The reference swaps each neighborhood cell through its 3 alternative
types sequentially, accumulating per-swap violation/oscillation deltas —
but those deltas telescope: candidate j's accumulated score is
``violations(board with cell=type_j) - violations(current board)``,
exactly the independent delta this annealer scores each candidate with
(the board is restored between neighborhood cells in both).  Penalties,
the oscillation bonus sign, the 27-candidate softmax and the
violating-cell target draw all match term for term.  The C++ annealer
remains the default for benchmark-parity procgen; this is the scale path
(~113 converged 18x18 still lifes/s at B=4096 on one v5e chip, 99%
convergence).  Supports still lifes AND period >= 2 oscillators (scored
with the reference's oscillation bonus).

Two level factories build on the annealer:

* :func:`gen_build_levels` — fast single-region banks (smoke/bench);
* :func:`gen_partitioned_levels` — the REAL task distribution: host-side
  Dirichlet region partitioning + fences + player/exit aprons (cheap
  numpy, amortized over the bank), then per-region board/goal pattern
  layers annealed on device with the reference's layer semantics
  (fences -> spawners/tree lattices/colored patterns incl. walls/trees
  -> movable-wall + hardened-life decoration -> goal-layer crates;
  foreground/background split as in ``populate_region``).  Covers the
  append-still/dynamic/spawn and prune-still/hard/dynamic/spawn
  families (_TASK_SPECS); gated against the reference archives by
  tests/test_procgen_distribution.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import cells as C
from ..ops import life

# Proposal cell types, indexed like the reference annealer:
# empty, wall, life, tree (gen_board.c cell_type_array).
TYPE_CELLS = np.array(
    [0, C.FROZEN, C.ALIVE | C.DESTRUCTIBLE, C.FROZEN | C.ALIVE], np.uint16)

def violation_field(board, period=1):
    """(H, W, B) bool: cells where advancing ``period`` steps does not
    return the board to itself — the reference's check_for_violation over
    a full cycle (still life for period 1, oscillator otherwise)."""
    b = board
    for _ in range(period):
        b = life.advance_board(b, jnp.zeros(board.shape, bool))
    return b != board


def oscillation_field(board, period):
    """(H, W, B) bool: cells whose ALIVE bit changes within the period
    (the reference's oscillation bitmask, gen_board.c)."""
    osc = jnp.zeros(board.shape, bool)
    b = board
    for _ in range(max(period - 1, 0)):
        b = life.advance_board(b, jnp.zeros(board.shape, bool))
        osc = osc | (((b ^ board) & C.ALIVE) != 0)
    return osc


def _advance_patch(patch):
    """CA advance on (..., P, P, B) patches with OPEN boundaries (zero
    outside); only the interior (+-2 of center) is meaningful.  Spawn-free,
    color-free still-life rules (proposal types carry no colors)."""
    alive = (patch & 1).astype(jnp.int32)

    def shift(x, k, axis):
        pad_shape = list(x.shape)
        pad_shape[axis] = abs(k)
        pad = jnp.zeros(pad_shape, x.dtype)
        if k > 0:
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(k, None)
            return jnp.concatenate([x[tuple(sl)], pad], axis=axis)
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(None, k)
        return jnp.concatenate([pad, x[tuple(sl)]], axis=axis)

    def nb_sum(x):
        r = x + shift(x, 1, -2) + shift(x, -1, -2)
        return r + shift(r, 1, -3) + shift(r, -1, -3)

    def nb_or(x):
        r = x | shift(x, 1, -2) | shift(x, -1, -2)
        return r | shift(r, 1, -3) | shift(r, -1, -3)

    counts = nb_sum(alive)
    flags = nb_or(patch.astype(jnp.int32))
    preserved = (flags & C.PRESERVING) != 0
    inhibited = (flags & C.INHIBITING) != 0
    is_alive = alive != 0
    frozen = (patch & C.FROZEN) != 0
    three = counts == 3
    survives = frozen | preserved | three | (counts == 4)
    born = three & ~frozen & ~inhibited
    born_cell = jnp.uint16(C.ALIVE | C.DESTRUCTIBLE)
    return jnp.where(
        is_alive, jnp.where(survives, patch, jnp.uint16(0)),
        jnp.where(born, born_cell, patch))


@partial(jax.jit, static_argnames=("iters", "batch", "period",
                                   "cell_penalties"))
def gen_still_lifes(key, mask, batch, board=None, iters=2000, min_fill=0.2,
                    temperature=0.5, cell_penalties=(0.0, 100.0, 0.0, 100.0),
                    period=1, osc_bonus=0.3):
    """Synthesize ``batch`` still lifes (period 1) or oscillators
    (period >= 2, scored with the reference's oscillation bonus) inside
    ``mask`` on device.

    mask: (H, W) or (H, W, B) bool — where new cells may be placed.
    Returns (boards, converged): (H, W, B) uint16 and (B,) bool.
    """
    PATCH = 4 * period + 3  # proposals +-1, viol band +-(p+1), stencil +-p
    mask = jnp.asarray(mask, bool)
    if mask.ndim == 2:
        mask = jnp.broadcast_to(mask[..., None], mask.shape + (batch,))
    h, w, b = mask.shape
    if board is None:
        board = jnp.zeros((h, w, b), jnp.uint16)
    area = mask.reshape(-1, b).sum(axis=0).astype(jnp.float32)
    min_fill_cells = min_fill * area
    beta = 1.0 / temperature
    flat_mask = mask.reshape(h * w, b)
    # Density-dependent type penalties, the reference's scheme
    # (gen_board.c / our C++ port: penalty_j = v0_j + (v1_j - v0_j) *
    # density_j where density_j = #cells of type j / #non-empty, both over
    # the mask).  Entries are (value at density 0, value at density 1)
    # pairs; bare scalars mean a constant penalty.
    pen_pairs = [(p, p) if np.isscalar(p) else tuple(p)
                 for p in cell_penalties]
    assert len(pen_pairs) == 4

    # Violations count on the mask PLUS its 1-cell border: patterns may not
    # leak births outside their region (the reference's border
    # INCLUDE_VIOLATIONS_MASK, proc_gen.py:286-294).
    def dilate(m):
        r = m | jnp.roll(m, 1, 0) | jnp.roll(m, -1, 0)
        return r | jnp.roll(r, 1, 1) | jnp.roll(r, -1, 1)
    viol_mask = dilate(mask)

    def type_index(cells):
        return (((cells & C.ALIVE) > 0).astype(jnp.int32) * 2
                | ((cells & C.FROZEN) > 0).astype(jnp.int32))

    def cells_of_type(idx):
        # TYPE_CELLS[idx] as a select chain — tiny-table gathers with a
        # traced index cost ~0.4 ms each on TPU; selects are free.
        out = jnp.full(idx.shape, TYPE_CELLS[3], jnp.uint16)
        for k in (2, 1, 0):
            out = jnp.where(idx == k, jnp.uint16(TYPE_CELLS[k]), out)
        return out

    half = PATCH // 2

    def gather_patch(x, t_row, t_col):
        """(H, W, B) array -> (P, P, B) patch centered per-board.

        Implemented as a per-lane barrel roll + static slice: a
        take_along_axis gather with wrapped indices costs ~2 ms/iter at
        B=4096 on TPU, the roll ~0.07 ms."""
        from ..ops.obs import barrel_roll
        rolled = barrel_roll(x, (t_row - half) % h, axis=0)
        rolled = barrel_roll(rolled, (t_col - half) % w, axis=1)
        return rolled[:PATCH, :PATCH]

    def patch_metrics(patch, vmask_patch, mask_patch):
        """(violations, oscillating-cell count) on the valid interior."""
        inner = slice(half - (period + 1), half + period + 2)
        b = patch
        osc = jnp.zeros(patch.shape, bool)
        for _ in range(period):
            b = _advance_patch(b)
            osc = osc | (((b ^ patch) & C.ALIVE) != 0)
        viol = (b != patch) & vmask_patch
        n_viol = viol[..., inner, inner, :].sum(axis=(-3, -2))
        if period == 1:
            return n_viol, 0
        n_osc = (osc & mask_patch)[..., inner, inner, :].sum(axis=(-3, -2))
        return n_viol, n_osc

    def anneal_step(board, key):
        k_cell, k_pick = jax.random.split(key)
        viol_full = (violation_field(board, period)
                     & viol_mask).reshape(h * w, b)
        n_viol = viol_full.sum(axis=0)
        filled = ((board != 0).reshape(h * w, b) & flat_mask).sum(axis=0)
        filled = filled.astype(jnp.float32)
        done = (n_viol == 0) & (filled >= min_fill_cells)

        # Sample a target: a violating cell if any, else any in-mask cell.
        want = jnp.where(n_viol[None, :] > 0, viol_full, flat_mask)
        g = jax.random.gumbel(k_cell, (h * w, b))
        target = jnp.argmax(jnp.where(want, 0.0, -1e30) + g, axis=0)
        t_row, t_col = target // w, target % w

        patch = gather_patch(board, t_row, t_col)
        vmask_patch = gather_patch(viol_mask, t_row, t_col)
        mask_patch = gather_patch(mask, t_row, t_col)
        base_viol, base_osc = patch_metrics(patch, vmask_patch, mask_patch)

        t = filled / jnp.maximum(min_fill_cells, 1.0)
        empty_pen = jnp.where(t < 0.9, 2.0,
                              jnp.where(t < 1.0, 20.0 * (1.0 - t), 0.0))

        # Per-lane density-dependent penalties for wall/life/tree.
        flat_board = board.reshape(h * w, b)
        occ = (flat_board != 0) & flat_mask
        t_all = type_index(flat_board)
        type_pens = [empty_pen]
        for j in (1, 2, 3):
            density = ((t_all == j) & occ).sum(axis=0) / (filled + 1.0)
            v0, v1 = pen_pairs[j]
            type_pens.append(jnp.float32(v0) + jnp.float32(v1 - v0)
                             * density)

        def pen_of(idx):
            out = type_pens[0]
            for j in (1, 2, 3):
                out = jnp.where(idx == j, type_pens[j], out)
            return out

        # 27 candidates: 3 alternative types at each cell of the central
        # 3x3 — built as ONE (27, P, P, B) stack so the advance + violation
        # count runs as a single batched op instead of 27 small ones.
        cand_list, cell_list, dr_list, dc_list, mask_list, pen_list = \
            [], [], [], [], [], []
        for drow in (-1, 0, 1):
            for dcol in (-1, 0, 1):
                pr, pc = half + drow, half + dcol
                cur_idx = type_index(patch[pr, pc])
                for j in range(1, 4):
                    idx = (cur_idx + j) % 4
                    cells = cells_of_type(idx)
                    cand_list.append(patch.at[pr, pc].set(cells))
                    cell_list.append(cells)
                    dr_list.append(jnp.full(b, drow, jnp.int32))
                    dc_list.append(jnp.full(b, dcol, jnp.int32))
                    mask_list.append(mask_patch[pr, pc])
                    pen_list.append(pen_of(idx))
        cands = jnp.stack(cand_list)                     # (27, P, P, B)
        cand_cells = jnp.stack(cell_list)
        cand_dr = jnp.stack(dr_list)
        cand_dc = jnp.stack(dc_list)
        in_mask = jnp.stack(mask_list)                   # (27, B)
        pens = jnp.stack(pen_list)

        cand_viol, cand_osc = patch_metrics(
            cands, vmask_patch[None], mask_patch[None])
        dv = (cand_viol - base_viol).astype(jnp.float32)     # (27, B)
        if period > 1:
            dosc = (cand_osc - base_osc).astype(jnp.float32)
            dv = dv - osc_bonus * dosc
        log_probs = jnp.where(in_mask, -beta * (dv + pens), -1e30)

        pick = jax.random.categorical(k_pick, log_probs, axis=0)
        # one-hot contraction instead of per-lane gathers (see above)
        onehot = (jnp.arange(27)[:, None] == pick[None, :])
        take = lambda x: jnp.where(onehot, x, 0).sum(axis=0).astype(x.dtype)
        new_cell = take(cand_cells)
        w_row = (t_row + take(cand_dr)) % h
        w_col = (t_col + take(cand_dc)) % w

        r_iota = jnp.arange(h, dtype=jnp.int32)[:, None, None]
        c_iota = jnp.arange(w, dtype=jnp.int32)[None, :, None]
        write_mask = (r_iota == w_row[None, None, :]) & \
            (c_iota == w_col[None, None, :])
        new_board = jnp.where(write_mask & ~done[None, None, :],
                              new_cell[None, None, :], board)
        return new_board, None

    keys = jax.random.split(key, iters)
    board, _ = jax.lax.scan(anneal_step, board, keys)
    viol = (violation_field(board, period) & viol_mask).reshape(h * w, b)
    filled = ((board != 0).reshape(h * w, b) & flat_mask).sum(axis=0)
    converged = (viol.sum(axis=0) == 0) & (filled >= min_fill_cells)
    return board, converged


# ---------------------------------------------------------------------------
# Fully on-device level factory
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("batch", "h", "w", "iters", "task"))
def gen_build_levels(key, batch, h=14, w=14, iters=1500, min_fill=0.12,
                     goal_fill=0.15, min_performance=0.3,
                     temperature=0.45, task="append"):
    """Generate a whole bank of single-region task levels on device:

    * ``task="append"`` — a green still life plus a blue still-life goal
      pattern to recreate (the append-easy family),
    * ``task="prune"`` — a green still life to preserve (board AND goals)
      plus red distractor life to remove,
    * ``task="append-spawn"`` — append with a yellow spawner stirring the
      region (stochastic dynamics, spawn_prob 0.3).

    The expensive parts — two batched annealing runs — never leave the
    chip; host code only triggers the final bank assembly.  Returns
    (LevelBank, converged (B,) bool).
    """
    from .. import cells as C
    from ..levels.device_bank import build_bank_from_arrays

    assert task in ("append", "prune", "append-spawn")
    k_pat, k_goal, k_player, k_spawner = jax.random.split(key, 4)
    # Interior pattern region with a 3-cell border buffer (2-cell walkway +
    # wall ring, mirroring the reference's region partition buffers).
    mask = jnp.zeros((h, w), bool).at[3:h - 3, 3:w - 3].set(True)

    boards, conv_b = gen_still_lifes(
        k_pat, mask, batch, iters=iters, min_fill=min_fill,
        temperature=temperature)
    alive_b = (boards & C.ALIVE) != 0
    board = jnp.where(alive_b, boards | jnp.uint16(C.COLOR_G), boards)

    if task == "prune":
        # Second annealing run grows red distractors around the (frozen-
        # out) green pattern; both patterns end as one joint still life.
        mask2 = mask[..., None] & (boards == 0)
        board2, conv_g = gen_still_lifes(
            k_goal, mask2, batch, board=boards, iters=iters,
            min_fill=goal_fill, temperature=temperature)
        new = (board2 != boards) & ((board2 & C.ALIVE) != 0)
        board = jnp.where(new, board2 | jnp.uint16(C.COLOR_R), board)
        # Goals: the green pattern only (preserve it; removing red pays).
        goals = jnp.where(alive_b, (boards | jnp.uint16(C.COLOR_G)),
                          jnp.uint16(0))
    else:
        goal_pat, conv_g = gen_still_lifes(
            k_goal, mask, batch, iters=iters, min_fill=goal_fill,
            temperature=temperature)
        alive_g = (goal_pat & C.ALIVE) != 0
        goals = jnp.where(alive_g,
                          (goal_pat | jnp.uint16(C.COLOR_B))
                          & ~jnp.uint16(C.SPAWNING),
                          jnp.uint16(0))

    # Wall ring just outside the region keeps patterns contained.
    ring = jnp.zeros((h, w), bool)
    ring = ring.at[2, 2:w - 2].set(True).at[h - 3, 2:w - 2].set(True)
    ring = ring.at[2:h - 2, 2].set(True).at[2:h - 2, w - 3].set(True)
    board = jnp.where(ring[..., None], jnp.uint16(C.WALL), board)

    # Player at a random outer-buffer cell; exit at the farthest buffer
    # cell (torus manhattan), per the reference's placement rule.
    buffer_mask = jnp.zeros((h, w), bool)
    buffer_mask = buffer_mask.at[:2, :].set(True).at[h - 2:, :].set(True)
    buffer_mask = buffer_mask.at[:, :2].set(True).at[:, w - 2:].set(True)
    flat_buf = buffer_mask.reshape(-1)
    g = jax.random.gumbel(k_player, (h * w, batch))
    p_flat = jnp.argmax(jnp.where(flat_buf[:, None], 0.0, -1e30) + g, axis=0)
    pr, pc = p_flat // w, p_flat % w

    rr = jnp.arange(h)[:, None, None]
    cc = jnp.arange(w)[None, :, None]
    dr = jnp.abs(rr - pr[None, None, :])
    dc = jnp.abs(cc - pc[None, None, :])
    dist = jnp.minimum(dr, h - dr) + jnp.minimum(dc, w - dc)
    dist = jnp.where(buffer_mask[..., None], dist, -1)
    e_flat = jnp.argmax(dist.reshape(h * w, batch), axis=0)
    er, ec = e_flat // w, e_flat % w

    pmask = (rr == pr[None, None, :]) & (cc == pc[None, None, :])
    emask = (rr == er[None, None, :]) & (cc == ec[None, None, :])
    board = jnp.where(pmask, jnp.uint16(C.PLAYER), board)
    board = jnp.where(emask, jnp.uint16(C.LEVEL_EXIT | C.COLOR_R), board)

    # White goals on the buffer (visual hint, reference gen_game).
    goals = jnp.where(buffer_mask[..., None] & (goals == 0),
                      jnp.uint16(C.COLORS), goals)

    spawn_prob = jnp.zeros(batch, jnp.float32)
    if task == "append-spawn":
        # One yellow spawner at a random in-region empty cell.
        g2 = jax.random.gumbel(k_spawner, (h * w, batch))
        empty = (board == 0) & mask[..., None]
        s_flat = jnp.argmax(
            jnp.where(empty.reshape(h * w, batch), 0.0, -1e30) + g2, axis=0)
        sr, sc = s_flat // w, s_flat % w
        smask = (rr == sr[None, None, :]) & (cc == sc[None, None, :])
        board = jnp.where(
            smask, jnp.uint16(C.SPAWNER | C.COLOR_R | C.COLOR_G), board)
        spawn_prob = jnp.full(batch, 0.3, jnp.float32)

    bank = build_bank_from_arrays(
        board, goals, pr, pc, min_performance=min_performance,
        spawn_prob=spawn_prob, static_goals=False,
        spawnless=(task != "append-spawn"),
        max_exits=1)  # the factory places exactly one exit per level
    return bank, conv_b & conv_g


# ---------------------------------------------------------------------------
# Multi-region partitioned levels (the real gen_game distribution).
# ---------------------------------------------------------------------------

MAX_REGIONS = 4


def _partition_scaffolds(batch, h, w, min_regions=2, max_regions=3):
    """Host-side level scaffolds: partition, fences, player/exit, aprons.

    Mirrors the host pipeline's pre-pattern stages (generate.gen_game:
    partition -> player + farthest exit -> 3x3 aprons -> per-region
    fences); the expensive annealing stays on device.  Uses numpy's
    global RNG like the host path (seed via np.random.seed).

    Returns dict of stacked numpy arrays:
      board0 (H, W, B) u16   — player + exit pre-painted (fences are
                               painted on device, per stack fence fraction)
      fence  (H, W, B) bool  — fence cells (part of fg AND bg)
      fence_slot (R, H, W, B) bool — fence cells per region slot
      slots  (R, H, W, B) bool — per-region workable masks
      buffer (H, W, B) bool  — unpainted buffer (for white goals)
      pr, pc (B,) int32      — player position
    """
    from . import generate as G

    board0 = np.zeros((h, w, batch), np.uint16)
    fence_all = np.zeros((h, w, batch), bool)
    fence_slot = np.zeros((MAX_REGIONS, h, w, batch), bool)
    slots = np.zeros((MAX_REGIONS, h, w, batch), bool)
    buffer_mask = np.zeros((h, w, batch), bool)
    pr = np.zeros(batch, np.int32)
    pc = np.zeros(batch, np.int32)

    for b in range(batch):
        regions = G.make_partitioned_regions(
            (h, w), min_regions=min_regions, max_regions=max_regions)
        board = np.zeros((h, w), np.uint16)

        buffer_flat = np.flatnonzero(regions == 0)
        ai, aj = divmod(int(buffer_flat[np.random.randint(
            len(buffer_flat))]), w)
        board[ai, aj] = C.PLAYER
        di = np.abs(np.arange(h)[:, None] - ai)
        dj = np.abs(np.arange(w)[None, :] - aj)
        dist = np.minimum(di, h - di) + np.minimum(dj, w - dj)
        dist = np.where(regions == 0, dist, -1)
        ei, ej = divmod(int(np.argmax(dist)), w)
        board[ei, ej] = C.LEVEL_EXIT | C.COLOR_R

        # 3x3 aprons: no region may touch the player or the exit.
        for ci, cj in ((ai, aj), (ei, ej)):
            rows = np.arange(ci - 1, ci + 2) % h
            cols = np.arange(cj - 1, cj + 2) % w
            regions[rows[:, None], cols[None, :]] = -1

        region_ids = [int(k) for k in np.unique(regions) if k > 0]
        fences = np.zeros((h, w), bool)
        for n, k in enumerate(region_ids[:MAX_REGIONS]):
            m = regions == k
            f = np.asarray(G.build_fence(m), bool)
            f &= (board == 0)  # never fence over the player/exit
            fences |= f
            slots[n, :, :, b] = m
            fence_slot[n, :, :, b] = f
        fence_all[:, :, b] = fences
        # The buffer is everything outside the regions — fences and the
        # player/exit cells included (gen_game's white-goal rule colors
        # every uncolored buffer cell).
        buffer_mask[:, :, b] = regions <= 0
        board0[:, :, b] = board
        pr[b], pc[b] = ai, aj
    return dict(board0=board0, fence=fence_all, fence_slot=fence_slot,
                slots=slots, buffer=buffer_mask, pr=pr, pc=pc)


# Region layer vocabulary for the partitioned painter: static per-task
# specs mirroring the presets.py named regions (reference _defaults.yaml
# named_regions).  Where the reference draws per-level 'choices' (region
# variant, fill bands, lattice color) we collapse to the archives'
# REALIZED ensemble: fills target realized means (our annealer stops
# growing at min_fill; the reference's retry loop lands mid-band) and the
# medium-vs-hard region choice becomes a per-level coin on the hard
# decoration (``hardened`` = (per-level prob, per-cell frac)).
#
# Layer keys: kind 'pattern'|'lattice'|'spawners'; color (u16, or
# 'gy' = per-level green/yellow coin); target 'board'|'goals'; period;
# fill/temp; wall/tree density-penalty pairs; movable (movable_walls
# frac); hardened; rate (spawner density); osc (oscillation bonus).
def _pat(color, target="board", period=1, fill=0.1, temp=0.5,
         wall=(1.0, 20.0), tree=(100.0, 100.0), movable=0.0,
         hardened=(0.0, 0.0), osc=0.0, fence=0.0):
    return dict(kind="pattern", color=color, target=target, period=period,
                fill=fill, temp=temp, wall=wall, tree=tree,
                movable=movable, hardened=hardened, osc=osc, fence=fence)


_APPEND_MED = (
    _pat(C.COLOR_G, fill=0.1, temp=0.5, tree=(1.0, 20.0), movable=0.3,
         fence=1.0),
    _pat(C.COLOR_B, target="goals", fill=0.05, temp=0.2, wall=(0.0, 20.0),
         movable=1.0),
)
_APPEND_DYN = (
    _pat(C.COLOR_G, period=2, fill=0.16, temp=0.5, tree=(1.0, 20.0),
         movable=0.1, osc=0.3, fence=1.0),
    _pat(C.COLOR_B, target="goals", period=2, fill=0.10, temp=0.8,
         wall=(0.0, 20.0), movable=1.0),
)
_PRUNE_MED = (
    _pat(C.COLOR_G, fill=0.1, temp=0.5, tree=(1.0, 20.0), movable=0.3,
         fence=1.0),
    _pat(C.COLOR_R, fill=0.05, temp=0.2, wall=(0.0, 20.0), movable=1.0),
)
# prune-still-hard later regions: choices ['prune medium', 'prune hard']
# (red fill bands 0.05-0.2 / 0.15-0.4, hard red is fully hardened).
_PRUNE_MED_HARD = (
    _pat(C.COLOR_G, fill=0.1, temp=0.5, tree=(1.0, 20.0), movable=0.2,
         fence=1.0),
    _pat(C.COLOR_R, fill=0.12, temp=0.35, wall=(0.0, 20.0), movable=1.0,
         hardened=(0.5, 1.0)),
)
# prune-dynamic later regions: choices ['prune dynamic medium', 'hard'].
_PRUNE_DYN = (
    _pat(C.COLOR_G, period=2, fill=0.10, temp=0.5, tree=(1.0, 20.0),
         movable=0.2, osc=0.3, fence=1.0),
    _pat(C.COLOR_R, period=2, fill=0.12, temp=0.6, wall=(0.0, 20.0),
         movable=1.0, hardened=(0.5, 1.0), osc=0.3),
)
# 'berry patch': green/yellow tree lattice + a loose green still layer +
# red removal targets.  Dynamic variant oscillates.
_BERRY = (
    dict(kind="lattice", color="gy", target="board", fence=(0.5, 1.0)),
    _pat(C.COLOR_G, fill=0.1, temp=0.5, wall=(100.0, 100.0)),
    _pat(C.COLOR_R, fill=0.15, temp=0.4, movable=1.0),
)
_BERRY_DYN = (
    dict(kind="lattice", color="gy", target="board", fence=(0.5, 1.0)),
    _pat(C.COLOR_G, period=2, fill=0.1, temp=0.5, wall=(0.5, 10.0),
         tree=(0.0, 20.0), osc=0.3),
    _pat(C.COLOR_R, period=2, fill=0.15, temp=0.5, movable=1.0, osc=0.3),
)
# 'empty spawner': fenced region holding only spawners (density 0.04).
_SPAWNER_EMPTY = (
    dict(kind="spawners", color=C.COLOR_R | C.COLOR_G, target="board",
         rate=0.04, fence=1.0),
)
_YELLOW = C.COLOR_R | C.COLOR_G
# 'spawner' (navigation's starting region): spawners + a yellow tree
# lattice + a period-0 ("unstable", no violation requirement) yellow life
# fill at 0.3 — the annealed period-0 layer reduces to a density fill
# (the spawners churn it at runtime anyway), expressed as kind='random'.
_NAV_SPAWNER = (
    dict(kind="spawners", color=_YELLOW, target="board", rate=0.04,
         fence=1.0),
    dict(kind="lattice", color=_YELLOW, target="board"),
    dict(kind="random", color=_YELLOW, target="board", rate=0.3),
)
# navigation later regions, per-level choice (reference navigation.yaml):
_JUNGLE = (
    dict(kind="lattice", color=C.COLOR_G, target="board"),
    _pat(C.COLOR_G, period=2, fill=0.25, tree=(0.0, 20.0), osc=0.3),
)
_SAVANNAH = (
    _pat(C.COLOR_G, period=2, fill=0.2, wall=(0.0, 20.0), osc=0.3),
)
# easy-curriculum regions (_defaults.yaml 'build easy' / 'prune easy').
_BUILD_EASY = (
    _pat(C.COLOR_B, target="goals", fill=0.1, temp=0.2, movable=0.5,
         fence=1.0),
)
_PRUNE_EASY = (
    _pat(C.COLOR_G, fill=0.05, temp=0.5, tree=(1.0, 20.0), movable=0.3,
         fence=1.0),
    _pat(C.COLOR_R, fill=0.05, temp=0.2, wall=(1.0, 20.0)),
)

# task -> dict(regions=max partition regions, start=starting-slot stack,
# later=later-slot stack, buffer='rubble'|None, min_perf=exit gate).
# A stack is a tuple of layer dicts, or a tuple of ALTERNATIVE stacks
# (the YAML 'choices') — then each level draws one alternative per slot.
# Partitioning min_regions is always 2 (presets.TASKS).
def _spec(regions, start, later, buffer=None, min_perf=0.5):
    def norm(s):  # a bare stack -> a 1-tuple of alternatives
        return (s,) if s and isinstance(s[0], dict) else tuple(s)
    return dict(regions=regions, start=norm(start), later=norm(later),
                buffer=buffer, min_perf=min_perf)


_TASK_SPECS = {
    "append-still": _spec(3, _APPEND_MED, _APPEND_MED),
    "append-still-easy": _spec(3, _APPEND_MED, (_APPEND_MED, _BUILD_EASY)),
    "append-dynamic": _spec(2, _APPEND_DYN, _APPEND_DYN),
    "append-spawn": _spec(3, _SPAWNER_EMPTY, _APPEND_MED),
    "prune-still": _spec(3, _PRUNE_MED, _PRUNE_MED),
    "prune-still-easy": _spec(4, (_PRUNE_MED, _PRUNE_EASY),
                              (_PRUNE_MED, _PRUNE_EASY)),
    "prune-still-hard": _spec(3, _BERRY, _PRUNE_MED_HARD),
    "prune-dynamic": _spec(3, _BERRY_DYN, _PRUNE_DYN),
    "prune-spawn": _spec(3, _SPAWNER_EMPTY, _PRUNE_MED),
    "navigation": _spec(2, _NAV_SPAWNER, (_JUNGLE, _SAVANNAH),
                        buffer="rubble", min_perf=-1.0),
}


def _dil(m):
    r2 = m | jnp.roll(m, 1, 0) | jnp.roll(m, -1, 0)
    return r2 | jnp.roll(r2, 1, 1) | jnp.roll(r2, -1, 1)


@partial(jax.jit, static_argnames=("batch", "iters", "task"))
def _paint_partitioned(key, board0, fence_slot, slots, buffer_mask, batch,
                       task, iters=1200):
    """Device phase of :func:`gen_partitioned_levels`: per region slot,
    paint the task's layer stack (generate._RegionPainter semantics) on a
    shared working board:

      * 'pattern' layers anneal a colored still/oscillating pattern
        (walls/trees per the density penalties); fresh live cells take
        the layer color, fresh walls take the movable decoration, fresh
        life may be hardened (DESTRUCTIBLE stripped).  target='goals'
        layers keep their color in the goal copy and put only their
        non-live cells (crates) on the board.
      * 'lattice' layers stamp the tree lattice (berry patches), with a
        per-level green/yellow color coin.
      * 'spawners' layers scatter spawners over the region interior
        (at least one per region, reference add_spawners).

    The fences painted by the scaffold take the first layer's
    movable_walls decoration (reference paint_layer: new_cells covers
    the fences).  Oscillating cells and their neighborhoods are frozen
    against later layers (run_pattern's CAN_OSCILLATE bookkeeping).
    """
    board = board0
    h, w = board.shape[:2]
    fg = board0 != 0
    bg = jnp.zeros(board.shape, bool)
    keep_color = jnp.zeros(board.shape, bool)
    osc_forbid = jnp.zeros(board.shape, bool)
    conv_all = jnp.ones(batch, bool)
    spec = _TASK_SPECS[task]
    max_regions = spec["regions"]

    lattice = jnp.asarray(
        np.broadcast_to(_host_lattice(h, w)[..., None], (h, w, batch)))

    for r in range(max_regions):
        alts = spec["start"] if r == 0 else spec["later"]
        # The YAML 'choices' between region stacks: one draw per level per
        # slot; each alternative's layers then apply only to its lanes
        # (the others see empty masks and no-op).
        lane_sel = [None] * len(alts)
        if len(alts) > 1:
            key, k_alt = jax.random.split(key)
            choice = jax.random.randint(k_alt, (batch,), 0, len(alts))
            lane_sel = [(choice == a)[None, None, :]
                        for a in range(len(alts))]

        for layers, lane in zip(alts, lane_sel):
            gate = (lambda m: m) if lane is None else (lambda m: m & lane)
            # Fences: per-cell coinflip at the stack's fence fraction
            # (reference add_fences; a tuple is the YAML per-level
            # 'choices' between fractions, e.g. berry patch [0.5, 1]).
            frac = layers[0].get("fence", 0.0)
            if frac:
                key, k_f, k_ff, k_mwf = jax.random.split(key, 4)
                if isinstance(frac, tuple):
                    pickf = jax.random.randint(k_ff, (batch,), 0,
                                               len(frac))
                    frac = jnp.take(jnp.asarray(frac, jnp.float32),
                                    pickf)[None, None, :]
                fc = gate(fence_slot[r]) & (board == 0) & (
                    jax.random.uniform(k_f, board.shape) < frac)
                board = jnp.where(fc, jnp.uint16(C.WALL), board)
                fg = fg | fc
                bg = bg | fc
                mov0 = layers[0].get("movable", 0.0)
                if mov0 > 0:
                    mw_f = fc & (jax.random.uniform(k_mwf, board.shape)
                                 < mov0)
                    board = jnp.where(mw_f, board | jnp.uint16(C.MOVABLE),
                                      board)

            for layer in layers:
                key, k1, k2, k3, k4 = jax.random.split(key, 5)
                avail = gate(slots[r] & (board == 0) & ~osc_forbid)
                color = layer["color"]
                if color == "gy":
                    coin = jax.random.bernoulli(k4, 0.5, (batch,))
                    color = jnp.where(coin, jnp.uint16(C.COLOR_G),
                                      jnp.uint16(C.COLOR_R | C.COLOR_G))
                    color = color[None, None, :]
                else:
                    color = jnp.uint16(color)

                if layer["kind"] == "spawners":
                    interior = avail & ~_dil(~slots[r])
                    cells = interior & (
                        jax.random.uniform(k1, board.shape) < layer["rate"])
                    # Guarantee >= 1 spawner when the region exists
                    # (reference add_spawners).
                    flat_int = interior.reshape(hw := h * w, batch)
                    none = ~cells.reshape(hw, batch).any(axis=0)
                    g = jax.random.gumbel(k2, (hw, batch))
                    pick = jnp.argmax(jnp.where(flat_int, g, -jnp.inf),
                                      axis=0)
                    forced = (jnp.arange(hw)[:, None] == pick[None, :]) \
                        & none[None, :] & flat_int
                    cells = cells | forced.reshape(h, w, batch)
                    board = jnp.where(
                        cells, jnp.uint16(C.SPAWNER) | color, board)
                    fg = fg | cells
                    bg = bg | cells
                    continue

                if layer["kind"] == "lattice":
                    cells = lattice & avail
                    board = jnp.where(cells, jnp.uint16(C.TREE) | color,
                                      board)
                    fg = fg | cells
                    bg = bg | cells
                    continue

                if layer["kind"] == "random":
                    # A period-0 ("unstable") layer: density fill of plain
                    # life with no violation requirement (the reference
                    # anneals with INCLUDE_VIOLATIONS_MASK dropped, which
                    # converges to a penalty-only density fill;
                    # generate._RegionPainter.run_pattern).
                    cells = avail & (
                        jax.random.uniform(k1, board.shape) < layer["rate"])
                    board = jnp.where(cells, jnp.uint16(C.LIFE) | color,
                                      board)
                    fg = fg | cells
                    bg = bg | cells
                    continue

                # Annealed pattern layer.
                period = layer["period"]
                e0, e1 = (0.0, 0.0), (0.0, 0.0)
                pens = (e0, tuple(layer["wall"]), e1, tuple(layer["tree"]))
                board1, conv1 = gen_still_lifes(
                    k1, avail, batch, board=board, iters=iters,
                    min_fill=layer["fill"], temperature=layer["temp"],
                    cell_penalties=pens, period=period,
                    osc_bonus=layer["osc"])
                new = board1 != board
                alive_new = new & ((board1 & C.ALIVE) != 0)
                board1 = jnp.where(alive_new, board1 | color, board1)
                if layer["movable"] > 0:
                    is_wall = new & (
                        (board1 & ~jnp.uint16(C.COLORS)) == C.WALL)
                    mw = is_wall & (jax.random.uniform(k2, board.shape)
                                    < layer["movable"])
                    board1 = jnp.where(mw, board1 | jnp.uint16(C.MOVABLE),
                                       board1)
                lvl_p, cell_f = layer["hardened"]
                if lvl_p > 0:
                    lanes = jax.random.bernoulli(k3, lvl_p, (batch,))
                    hard = alive_new & lanes[None, None, :]
                    if cell_f < 1.0:
                        hard = hard & (jax.random.uniform(k4, board.shape)
                                       < cell_f)
                    board1 = jnp.where(
                        hard, board1 & ~jnp.uint16(C.DESTRUCTIBLE), board1)
                if period > 1:
                    # Freeze the oscillators' neighborhoods against later
                    # layers: edits there would propagate into the cycle
                    # (generate._RegionPainter.run_pattern).
                    nxt = life.advance_board(
                        board1, jnp.zeros(board.shape, bool))
                    osc = (nxt != 0) != (board1 != 0)
                    osc_forbid = osc_forbid | _dil(osc)
                bg = bg | new
                if layer["target"] == "goals":
                    keep_color = keep_color | new
                    # Goal-layer walls still land on the board as crates;
                    # only its live cells are goal-only (mark_targets).
                    fg = fg | (new & ~alive_new)
                else:
                    fg = fg | new
                board = board1
                conv_all = conv_all & conv1

    if spec["buffer"] == "rubble":
        # navigation's 'rubble' buffer: black walls scattered over the
        # unpainted buffer at ~0.3 fill (the wall-bonus anneal of
        # _defaults.yaml 'rubble' converges to a wall density fill).
        key, k_rub = jax.random.split(key)
        rubble = buffer_mask & (board == 0) & \
            (jax.random.uniform(k_rub, board.shape) < 0.3)
        board = jnp.where(rubble, jnp.uint16(C.WALL), board)
        fg = fg | rubble
        bg = bg | rubble

    final_board = jnp.where(fg, board, jnp.uint16(0))
    goals = jnp.where(bg, board, jnp.uint16(0))
    goals = goals & ~jnp.uint16(C.SPAWNING)
    goals = jnp.where(keep_color, goals, goals & ~jnp.uint16(C.COLORS))
    # White buffer goals (visual hint, gen_game): every uncolored buffer
    # cell — fence copies included — gains the white color.
    white = buffer_mask & ((goals & jnp.uint16(C.COLORS)) == 0)
    goals = jnp.where(white, goals | jnp.uint16(C.COLORS), goals)
    return final_board, goals, conv_all


def _host_lattice(h, w):
    """The default staggered tree lattice as a (H, W) numpy mask
    (generate._lattice_cells with spec=True: spacing 5)."""
    from .generate import _lattice_cells
    return np.asarray(_lattice_cells((h, w), True), bool)


def gen_partitioned_levels(task, num_levels, seed=0, h=26, w=26,
                           iters=1200):
    """Generate a bank of multi-region levels from the REAL task
    distribution (partition -> fence -> layered regions), annealing on
    device.  Supported tasks: all 8 benchmark families (append/prune x
    still/still-hard/dynamic/spawn + navigation) plus the easy curriculum
    variants (append-still-easy, prune-still-easy) — each mapped to its
    preset region stack (_TASK_SPECS; presets.TASKS), including the
    per-level 'choices' between alternative region stacks.

    Returns (LevelBank, converged (B,) bool).  Cite: reference
    proc_gen.py:474-594 (gen_game) + levels/random/*.yaml.
    """
    from ..levels.device_bank import build_bank_from_arrays

    spec = _TASK_SPECS[task]
    np.random.seed(seed)
    sc = _partition_scaffolds(num_levels, h, w,
                              max_regions=spec["regions"])
    key = jax.random.PRNGKey(seed)
    board, goals, conv = _paint_partitioned(
        key, jnp.asarray(sc["board0"]), jnp.asarray(sc["fence_slot"]),
        jnp.asarray(sc["slots"]), jnp.asarray(sc["buffer"]),
        batch=num_levels, task=task, iters=iters)
    all_layers = [l for stack in (spec["start"] + spec["later"])
                  for l in stack]
    static_goals = all(l.get("period", 1) == 1 for l in all_layers)
    has_spawners = any(l["kind"] == "spawners" for l in all_layers)
    bank = build_bank_from_arrays(
        board, goals, jnp.asarray(sc["pr"]), jnp.asarray(sc["pc"]),
        min_performance=spec["min_perf"],
        spawn_prob=jnp.full(num_levels, 0.3, jnp.float32)
        if has_spawners else None,
        static_goals=static_goals, spawnless=not has_spawners,
        simple_goals=not static_goals,
        max_exits=1)  # the factory places exactly one exit per level
    return bank, conv
