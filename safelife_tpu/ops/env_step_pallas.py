"""Fused Pallas TPU kernel for the full environment step core.

One VMEM-resident kernel per 128-env block computes the hot path of
``BatchedSafeLifeEnv.step``:

* agent action execution (move with push/pull, toggle create/destroy, exit
  detection): the reference's branchy per-board Python
  (``safelife_game.py:294-393``) as per-lane masked selects — the four
  agent-neighborhood cell reads arrive precomputed from XLA (a tiny
  take_along_axis is ~400x cheaper than in-kernel masked reductions),
* the CA advance of BOTH board and goals with in-core PRNG spawn sampling
  (``advance_board.c``); the goals advance is skipped entirely for banks
  whose goal boards are CA fixed points (all the *-still suites),
* goal scoring (``safelife_game.py:554-631``) with the per-cell point
  value computed by ONE select-chain — the performance sign is
  ``sign(points)`` per cell and the max-possible unit reward is a goal-
  color range test, halving the scoring arithmetic,
* exit recoloring from the fresh performance gate
  (``safelife_game.py:522-537``).

The XLA expression of the same math (ops/agent.py, ops/life.py,
ops/scoring.py) materializes every stencil shift and mask in HBM; this
kernel reads board/goals/init_board once and writes board/goals once.  The
XLA path remains the reference implementation (CPU, bit-exact parity mode)
and the two are tested equal.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cells as C
from .life_pallas import (LANES, _advance_block, _advance_pair,
                          _advance_pair_spawnsimple,
                          _advance_with_simple_goals, _spawn_field,
                          _spawn_field_pair)

_DR = (-1, 0, 1, 0)
_DC = (0, 1, 0, -1)

# sign(POINT_TABLE).max(axis=1) is 1 exactly for the six "real" goal colors
# and 0 for black/white — the possible-score lookup is a range test.
assert list(np.sign(C.POINT_TABLE).max(axis=1)) == [0, 1, 1, 1, 1, 1, 1, 0]


def _select_by_orient(o, table):
    out = jnp.int32(table[0])
    for k in (1, 2, 3):
        out = jnp.where(o == k, jnp.int32(table[k]), out)
    return out


# Each goal-color row of the 8x8 point table packed into one int32: entry
# value+3 (in [0, 8]) in bits [4c, 4c+4).  The per-cell lookup selects the
# row with a balanced 3-level select tree on the goal-color bits (7
# selects instead of the 8-term multiply-accumulate chain), then extracts
# the nibble with a variable shift.
_PACKED_ROWS = tuple(
    int(sum((int(v) + 3) << (4 * c) for c, v in enumerate(row)))
    for row in C.POINT_TABLE)
assert all(0 <= r < 2**31 for r in _PACKED_ROWS)


def _pts_cell(gc, cc):
    """point_table[gc, cc] per cell via select-tree row pick + shift."""
    R = _PACKED_ROWS
    b0 = (gc & 1) != 0
    b1 = (gc & 2) != 0
    b2 = (gc & 4) != 0
    t01 = jnp.where(b0, jnp.int32(R[1]), jnp.int32(R[0]))
    t23 = jnp.where(b0, jnp.int32(R[3]), jnp.int32(R[2]))
    t45 = jnp.where(b0, jnp.int32(R[5]), jnp.int32(R[4]))
    t67 = jnp.where(b0, jnp.int32(R[7]), jnp.int32(R[6]))
    t03 = jnp.where(b1, t23, t01)
    t47 = jnp.where(b1, t67, t45)
    packed = jnp.where(b2, t47, t03)
    return ((packed >> (cc * 4)) & 15) - 3


def _apply_action(board, si_ref):
    """Agent action execution on one (H, W, L) int32 block.

    Reads the action/agent scalars from ``si_ref`` rows 0-5 and returns
    ``(board', agent_row', agent_col', orientation', exited)``.  Folding
    this into the advance kernel (saving the post-action board's HBM
    round-trip) was tried and measured SLOWER on chip at the bench batch
    (stress 7129 -> 7630 us/step, append-dynamic 6178 -> 6788, B=65536,
    2026-08-19): the merged kernel's extra VMEM pressure costs more in
    lost double-buffering than the dispatch + round-trip it saves.
    """
    h, w, lanes = board.shape

    action = si_ref[0, :]
    agent_r = si_ref[1, :]
    agent_c = si_ref[2, :]
    orient = si_ref[3, :]
    game_over = si_ref[4, :]
    can_exit0 = si_ref[5, :]

    # ---- action decode + move/toggle logic (per-lane scalars) -----------
    act_dir = (action - 1) % 4
    is_move = (action >= 1) & (action <= 4) & (game_over == 0)
    is_toggle = (action >= 5) & (action <= 8) & (game_over == 0)
    new_orient = jnp.where(is_move | is_toggle, act_dir, orient)
    dr = _select_by_orient(new_orient, _DR)
    dc = _select_by_orient(new_orient, _DC)
    r0, c0 = agent_r, agent_c
    r1, c1 = (r0 + dr) % h, (c0 + dc) % w
    r2, c2 = (r0 - dr) % h, (c0 - dc) % w
    r3, c3 = (r0 + 2 * dr) % h, (c0 + 2 * dc) % w

    # The four agent-neighborhood reads, as masked reductions (a separate
    # XLA gather would be cheaper as an op, but every extra op in the step
    # costs a dispatch; keeping them in-kernel wins overall).  The four
    # cell masks are built once and shared with the write pass below, and
    # the reads are packed pairwise (cell_a | cell_b << 16) so the whole
    # neighborhood costs two reduction passes instead of four.  The packed
    # positions are always distinct ((dr, dc) != 0 even for NULL, and
    # 3*|d| < board size), so the OR-combine never collides.
    # Row/col equality computed on (h, L)/(w, L) planes (1/W the cost of
    # full-size compares); only the AND touches the full block.
    r_iota2 = jax.lax.broadcasted_iota(jnp.int32, (h, lanes), 0)
    c_iota2 = jax.lax.broadcasted_iota(jnp.int32, (w, lanes), 0)

    def cell_mask(r, c):
        return (r_iota2 == r[None, :])[:, None, :] \
            & (c_iota2 == c[None, :])[None, :, :]

    m0 = cell_mask(r0, c0)
    m1 = cell_mask(r1, c1)
    m2 = cell_mask(r2, c2)
    m3 = cell_mask(r3, c3)

    hi = board << 16
    g01 = jnp.sum(jnp.where(m0, board, 0) | jnp.where(m1, hi, 0),
                  axis=(0, 1))
    g23 = jnp.sum(jnp.where(m2, board, 0) | jnp.where(m3, hi, 0),
                  axis=(0, 1))
    v0 = g01 & 0xFFFF
    v1 = (g01 >> 16) & 0xFFFF
    v2 = g23 & 0xFFFF
    v3 = (g23 >> 16) & 0xFFFF

    front_empty = v1 == 0
    front_exit = ~front_empty & ((v1 & C.EXIT) != 0) & (can_exit0 != 0)
    pushable = ~front_empty & ~front_exit & ((v1 & C.PUSHABLE) != 0)
    push_to_empty = pushable & (v3 == 0)
    push_out_exit = pushable & (v3 != 0) & ((v3 & C.EXIT) != 0)
    moved = is_move & (front_empty | push_to_empty | push_out_exit)
    exited = is_move & front_exit
    pulled = moved & ((v2 & C.PULLABLE) != 0)

    player_color = v0 & C.COLORS
    tgl_create = is_toggle & (v1 == 0)
    tgl_destroy = is_toggle & (v1 != 0) & ((v1 & C.DESTRUCTIBLE) != 0)

    # ---- masked writes (select chain; cell masks shared with the reads) -
    p1_val = jnp.where(moved, v0,
                       jnp.where(tgl_create, C.LIFE | player_color, 0))
    p0_val = jnp.where(pulled, v2, 0)
    board = jnp.where(m3 & (is_move & push_to_empty)[None, None, :],
                      v1[None, None, :], board)
    board = jnp.where(m1 & (moved | tgl_create | tgl_destroy)[None, None, :],
                      p1_val[None, None, :], board)
    board = jnp.where(m2 & pulled[None, None, :], 0, board)
    board = jnp.where(m0 & moved[None, None, :],
                      p0_val[None, None, :], board)

    return (board, jnp.where(moved, r1, r0), jnp.where(moved, c1, c0),
            new_orient, exited)


def _action_kernel(si_ref, board_ref, out_board_ref, out_i_ref):
    board, ar, ac, orient, exited = _apply_action(
        board_ref[:].astype(jnp.int32), si_ref)
    out_board_ref[:] = board.astype(jnp.uint16)
    out_i_ref[0, :] = ar
    out_i_ref[1, :] = ac
    out_i_ref[2, :] = orient
    out_i_ref[3, :] = exited.astype(jnp.int32)


def _roll_back(x, amount, axis):
    """jnp.roll(x, -amount, axis) in-kernel."""
    n = x.shape[axis]
    return pltpu.roll(x, n - amount % n, axis)


def _obs_view_block(combined, ar, ac, obs_view, exit_r, exit_c, exit_v,
                    vals=None):
    """Packed agent-centered view of one block, all in VMEM.

    The per-lane recentering is the same barrel roll as ops/obs.py
    (log2 conditional rolls selected per lane); views larger than the
    board tile it by concatenation; exits are projected onto the view
    perimeter.  ``vals`` (per-lane exit cell values, synthesized from
    scalars for static-goal banks) skips the per-exit masked board reads;
    when None they are read from ``combined`` with masked reductions.
    """
    h, w, lanes = combined.shape
    vh, vw = obs_view

    if vals is None:
        # Exit values read before recentering (the source positions are
        # in board coordinates).
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (h, lanes), 0)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (w, lanes), 0)
        vals = []
        for i in range(len(exit_r)):
            src = (r_iota == exit_r[i][None, :])[:, None, :] & \
                (c_iota == exit_c[i][None, :])[None, :, :]
            vals.append(jnp.sum(jnp.where(src, combined, 0), axis=(0, 1)))

    rs = (ar - vh // 2) % h
    cs = (ac - vw // 2) % w
    x = combined
    for k in range((h - 1).bit_length()):
        bit = ((rs >> k) & 1)[None, None, :] != 0
        x = jnp.where(bit, _roll_back(x, 1 << k, 0), x)
    if vh > h:
        x = jnp.concatenate([x] * (-(-vh // h)), axis=0)
    # Slice rows before the column rolls: they act per-row, so the
    # remaining rolls touch vh/h of the data.
    x = x[:vh]
    for k in range((w - 1).bit_length()):
        bit = ((cs >> k) & 1)[None, None, :] != 0
        x = jnp.where(bit, _roll_back(x, 1 << k, 1), x)
    if vw > w:
        x = jnp.concatenate([x] * (-(-vw // w)), axis=1)
    view = x[:, :vw, :]

    vr_iota = jax.lax.broadcasted_iota(jnp.int32, (vh, lanes), 0)
    vc_iota = jax.lax.broadcasted_iota(jnp.int32, (vw, lanes), 0)
    for i in range(len(exit_r)):  # row-major order: last exit wins
        jy = (exit_r[i] - ar + h // 2) % h - h // 2
        jx = (exit_c[i] - ac + w // 2) % w - w // 2
        jy = jnp.clip(jy + vh // 2, 0, vh - 1)
        jx = jnp.clip(jx + vw // 2, 0, vw - 1)
        valid = exit_v[i] != 0
        mask = (vr_iota == jy[None, :])[:, None, :] \
            & ((vc_iota == jx[None, :]) & valid[None, :])[None, :, :]
        view = jnp.where(mask, vals[i][None, None, :], view)
    return view


def _advance_kernel(*all_refs, static_goals,
                    time_limit=0, spawnless=False, simple_goals=False,
                    spawn_simple_goals=False,
                    obs_view=None, num_exits=0, remove_white_goals=True,
                    reset_prefetch=False):
    """CA advance + scoring + exit recolor, optionally folding the
    auto-reset select into the same write pass (``time_limit > 0``): the
    episode's done flag is computable in-kernel (times_up | game_over |
    exited), so resetting lanes swap in the fresh bank level without a
    separate full-array select outside.  With ``obs_view`` set (fold path
    only), the packed agent-centered observation is emitted from the same
    VMEM residency — the boards never make a second HBM round-trip for
    observation extraction."""
    # With reset_prefetch the first ref is the scalar-prefetched
    # per-block resets flag (consumed by the fresh specs' index_maps;
    # the body itself recomputes done per lane).
    seed_ref, si_ref, sf_ref, *refs = \
        all_refs[1:] if reset_prefetch else all_refs
    do_reset = time_limit > 0
    emit_obs = obs_view is not None
    assert not emit_obs or do_reset
    # The state carries no init_goals leaf at all (the original goal
    # board is bank.goals[level_idx], recoverable from the level_idx
    # the state already tracks) — the kernel streams exactly three
    # live boards + three fresh boards, static or dynamic goals alike.
    refs = list(refs)
    act_ref = obs_i_ref = out_obs_ref = None
    if do_reset:
        act_ref = refs.pop(0)
    if emit_obs:
        obs_i_ref = refs.pop(0)
    board_ref, goals_ref, init_ref = refs[:3]
    del refs[:3]
    if do_reset:
        fb_ref, fg_ref, fib_ref = refs[:3]
        del refs[:3]
    out_board_ref, out_goals_ref = refs[:2]
    del refs[:2]
    if do_reset:
        out_ib_ref = refs.pop(0)
    if emit_obs:
        out_obs_ref = refs.pop(0)
    (out_i_ref,) = refs
    h, w, lanes = board_ref.shape
    baseline = si_ref[6, :]
    min_perf = sf_ref[1, :]

    board_in = board_ref[:].astype(jnp.int32)

    # ---- CA advance -------------------------------------------------------
    # Paired advances share one presence stencil between the two boards
    # (life_pallas._advance_pair / _advance_with_simple_goals): the
    # dynamic-goals step runs 2-3 neighbor-sum passes instead of 3-4.
    spawn_b = spawn_g = None
    needs_goal_spawn = not (static_goals or simple_goals or spawnless)
    if not spawnless:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        spawn_prob = sf_ref[0, :]
        if needs_goal_spawn:
            # Both boards sample spawns: one PRNG draw, 16-bit halves
            # (life_pallas._spawn_field_pair).
            thresh16 = (spawn_prob * jnp.float32(1 << 16)).astype(jnp.int32)
            spawn_b, spawn_g = _spawn_field_pair(
                (h, w, lanes), thresh16[None, None, :])
        else:
            thresh24 = (spawn_prob * jnp.float32(1 << 24)).astype(jnp.int32)
            spawn_b = _spawn_field((h, w, lanes), thresh24[None, None, :])
    if static_goals:
        board = _advance_block(board_in, spawn_b)
        goals = goals_ref[:].astype(jnp.int32)
    elif simple_goals:
        # Certified-simple goal boards: spawn can never fire on them and
        # the rule collapses (see _advance_goals_simple) — bit-exact vs
        # the full rule on such boards.
        board, goals = _advance_with_simple_goals(
            board_in, spawn_b, goals_ref[:].astype(jnp.int32))
    elif spawn_simple_goals:
        # Goal boards with spawners but certified free of PRESERVING/
        # INHIBITING/EXIT (the goal-spawner stress case): two stencils
        # instead of the general pair's three — bit-exact vs the full
        # rule on such boards (tests/test_fused_step.py).
        board, goals = _advance_pair_spawnsimple(
            board_in, spawn_b, goals_ref[:].astype(jnp.int32), spawn_g)
    else:
        board, goals = _advance_pair(
            board_in, spawn_b, goals_ref[:].astype(jnp.int32), spawn_g)

    # ---- scoring ------------------------------------------------------------
    alive = (board & 1) != 0
    gc = (goals >> C.COLOR_BIT) & 7
    pts_cell = _pts_cell(gc, (board >> C.COLOR_BIT) & 7)
    points = jnp.sum(jnp.where(alive, pts_cell, 0), axis=(0, 1))
    frozen_immov = (board & (C.FROZEN | C.PUSHABLE | C.PULLABLE)) == C.FROZEN
    perf_mask = alive & ~frozen_immov
    sign_cell = jnp.sign(pts_cell)
    score = jnp.sum(jnp.where(perf_mask, sign_cell, 0), axis=(0, 1))
    comp = score - baseline
    if static_goals:
        # The goal board never changes, so the possible score is the live
        # per-lane value computed at reset (passed through si row 8).
        poss = si_ref[8, :]
    else:
        possible = jnp.sum(((gc != 0) & (gc != 7)).astype(jnp.int32),
                           axis=(0, 1))
        poss = possible - baseline

    # ---- exit recolor ---------------------------------------------------------
    ce1 = (min_perf < 0) | (comp.astype(jnp.float32)
                            >= min_perf * poss.astype(jnp.float32))
    init_board = init_ref[:].astype(jnp.int32)
    exit_mask = (init_board & C.EXIT) != 0
    exit_cell = jnp.where(ce1, C.LEVEL_EXIT | C.COLOR_R, C.LEVEL_EXIT)
    board = jnp.where(exit_mask, exit_cell[None, None, :], board)

    # ---- side-effect cell count (env_wrappers.py:306-346 semantics) -----
    bb = board & ~C.PLAYER
    sb = init_board & ~C.PLAYER
    bb = jnp.where(exit_mask, sb, bb)
    red_life = C.ALIVE | C.COLOR_R
    start_red = (sb & red_life) == red_life
    end_red = (bb & red_life) == red_life
    goal_cell = (goals & C.COLORS) == C.COLOR_B
    end_alive = (bb & red_life) == C.ALIVE
    non_effects = (bb == sb) | (start_red & ~end_red) | \
        (goal_cell & end_alive)
    effect = jnp.sum((~non_effects).astype(jnp.int32), axis=(0, 1))

    if do_reset:
        episode_length = si_ref[7, :] + 1
        exited = act_ref[3, :] != 0
        game_over = (si_ref[4, :] != 0) | exited
        done = (episode_length > time_limit) | game_over

        def write_outputs(resetting):
            """Write the output boards (+obs), folding the fresh-level
            select only when ``resetting`` — with no done lane in this
            128-lane block every ``where(done, …)`` is the identity, so
            the non-resetting branch writes the step results directly
            and skips the select passes.  At time_limit=1000 a block has
            a resetting lane on ~12% of steps, so ~88% of blocks take
            the cheap branch (bit-identical by construction).  The fresh
            blocks are fetched only when this block resets (their
            dynamic index_map sends every non-resetting block to block 0
            and the pipeline skips refetching an unchanged block), so the
            cheap branch also skips their 3 full HBM board reads — the
            largest single stream cost of the fold path; it must not
            touch fb/fg/fib (their VMEM holds another block's data)."""
            m = done[None, None, :]
            if resetting:
                out_board_ref[:] = jnp.where(
                    m, fb_ref[:], board.astype(jnp.uint16))
                goals_out = goals_ref[:] if static_goals \
                    else goals.astype(jnp.uint16)
                out_goals_ref[:] = jnp.where(m, fg_ref[:], goals_out)
                out_ib_ref[:] = jnp.where(m, fib_ref[:], init_ref[:])
            else:
                out_board_ref[:] = board.astype(jnp.uint16)
                out_goals_ref[:] = goals_ref[:] if static_goals \
                    else goals.astype(jnp.uint16)
                out_ib_ref[:] = init_ref[:]
            if emit_obs:
                # Post-reset state for the observation: the kernel's
                # output boards plus reset-selected agent position and
                # exit tables (obs_i rows: fresh_ar, fresh_ac, then exit
                # r/c/v for the live state and the fresh levels, then
                # live/fresh exit goal colors and the fresh reset-time
                # exit gate).
                k = num_exits
                sel = lambda f, l: jnp.where(done, f, l) \
                    if resetting else l  # noqa: E731
                live_ar = act_ref[0, :]
                live_ac = act_ref[1, :]
                ar = sel(obs_i_ref[0, :], live_ar)
                ac = sel(obs_i_ref[1, :], live_ac)
                rows = lambda base, stride=3: [  # noqa: E731
                    sel(obs_i_ref[base + stride * k + i, :],
                        obs_i_ref[base + i, :]) for i in range(k)]
                exit_r = rows(2)
                exit_c = rows(2 + k)
                exit_v = rows(2 + 2 * k)
                vals = None
                if static_goals:
                    # Exit cells are frozen LEVEL_EXIT(+red iff the gate
                    # is open) after recoloring, and the goal color under
                    # them never changes — so the projected exit pixels
                    # are pure per-lane scalars; no masked board reads
                    # needed.
                    gate = sel(obs_i_ref[2 + 8 * k, :],
                               ce1.astype(jnp.int32))
                    red = gate * jnp.int32(C.COLOR_R)
                    vals = []
                    for gc_i in rows(2 + 6 * k, stride=1):
                        if remove_white_goals:
                            gc_i = jnp.where(gc_i == 7, 0, gc_i)
                        vals.append(jnp.int32(C.LEVEL_EXIT) | red
                                    | (gc_i << (C.COLOR_BIT + 3)))
                if resetting:
                    final_b = jnp.where(m, fb_ref[:].astype(jnp.int32),
                                        board)
                    final_g = jnp.where(m, fg_ref[:].astype(jnp.int32),
                                        goals)
                else:
                    final_b, final_g = board, goals
                gcol = final_g & C.COLORS
                if remove_white_goals:
                    gcol = jnp.where(gcol == C.COLORS, 0, gcol)
                combined = final_b + (gcol << 3)
                view = _obs_view_block(combined, ar, ac, obs_view,
                                       exit_r, exit_c, exit_v, vals)
                out_obs_ref[:] = view.astype(jnp.uint16)

        any_done = jnp.any(done)
        pl.when(any_done)(lambda: write_outputs(True))
        pl.when(jnp.logical_not(any_done))(lambda: write_outputs(False))
    else:
        out_board_ref[:] = board.astype(jnp.uint16)
        if static_goals:
            out_goals_ref[:] = goals_ref[:]
        else:
            out_goals_ref[:] = goals.astype(jnp.uint16)
    out_i_ref[0, :] = points
    out_i_ref[1, :] = comp
    out_i_ref[2, :] = poss
    out_i_ref[3, :] = ce1.astype(jnp.int32)
    out_i_ref[4, :] = effect


@partial(jax.jit, static_argnames=("interpret", "static_goals",
                                   "time_limit", "spawnless",
                                   "simple_goals", "spawn_simple_goals",
                                   "obs_view", "remove_white_goals"))
def fused_step(board, goals, init_board, action, agent_row, agent_col,
               orientation, game_over, can_exit0, baseline_score,
               spawn_prob, min_performance, seed, interpret=False,
               static_goals=False, episode_length=None,
               fresh=None, time_limit=0, spawnless=False,
               simple_goals=False, spawn_simple_goals=False, obs_view=None,
               exit_row=None, exit_col=None, exit_valid=None,
               exit_gcol=None,
               remove_white_goals=True, perf_possible=None):
    """Run the fused env-step core.  All per-env args are (B,) with
    B % 128 == 0; boards are (H, W, B) uint16.

    With ``time_limit > 0`` the auto-reset select for the three board
    arrays is folded into the advance kernel's write pass: pass
    ``episode_length`` and ``fresh`` (a dict holding the pre-gathered
    fresh board/goals/init_board).  The environment carries no
    init_goals plane — the original goal board is ``bank.goals`` at the
    state's ``level_idx`` for any cold-path consumer.

    With ``obs_view=(vh, vw)`` (fold path only; pass the live exit
    tables too) the packed agent-centered observation view is emitted
    from the kernel's VMEM residency — append it as the last output.

    Returns (board', goals', agent_row', agent_col', orientation', exited,
    points, perf_completed, perf_possible, can_exit1[, init_board']
    [, obs_view_packed]).
    """
    h, w, b = board.shape
    assert b % LANES == 0, f"batch {b} must be a multiple of {LANES}"
    # Block width: 128 lanes is fastest end-to-end (bench.py: 8.2M
    # steps/s at B=16k vs 5.5M with 256-lane and 6.4M with 1024-lane
    # blocks) — the many-stream pipeline wants fine-grained double
    # buffering.  (Only trust CHAINED timings on this stack: independent
    # repeated calls overlap in the remote executor and can appear
    # impossibly fast.)
    block = LANES
    grid = (b // block,)
    board_spec = pl.BlockSpec((h, w, block), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
        (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    bshape = jax.ShapeDtypeStruct((h, w, b), jnp.uint16)

    si = jnp.stack([
        jnp.asarray(action, jnp.int32), jnp.asarray(agent_row, jnp.int32),
        jnp.asarray(agent_col, jnp.int32),
        jnp.asarray(orientation, jnp.int32),
        game_over.astype(jnp.int32), can_exit0.astype(jnp.int32),
        jnp.asarray(baseline_score, jnp.int32),
        jnp.zeros(b, jnp.int32) if episode_length is None
        else jnp.asarray(episode_length, jnp.int32),
        jnp.zeros(b, jnp.int32) if perf_possible is None
        else jnp.asarray(perf_possible, jnp.int32)])
    if static_goals:
        assert perf_possible is not None, \
            "static_goals=True needs the live perf_possible (si row 8)"
    sf = jnp.stack([jnp.asarray(spawn_prob, jnp.float32),
                    jnp.asarray(min_performance, jnp.float32)])

    board1, act_i = pl.pallas_call(
        _action_kernel,
        grid=grid,
        in_specs=[lane_spec(9), board_spec],
        out_specs=(board_spec, lane_spec(4)),
        out_shape=(bshape, jax.ShapeDtypeStruct((4, b), jnp.int32)),
        interpret=interpret,
    )(si, board)
    act_specs, act_args = [lane_spec(4)], [act_i]

    emit_obs = obs_view is not None and time_limit > 0
    num_exits = exit_row.shape[0] if emit_obs else 0
    kern = partial(_advance_kernel, static_goals=static_goals,
                   time_limit=time_limit, spawnless=spawnless,
                   simple_goals=simple_goals,
                   spawn_simple_goals=spawn_simple_goals,
                   obs_view=obs_view if emit_obs else None,
                   num_exits=num_exits,
                   remove_white_goals=remove_white_goals)
    common = [pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
              lane_spec(9), lane_spec(2)]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    obs_in, obs_in_specs, obs_out_specs, obs_out_shape = [], [], [], []
    if emit_obs:
        k = num_exits
        mp = jnp.asarray(fresh["min_performance"], jnp.float32)
        fresh_ce0 = (mp < 0) | (
            0 >= mp * jnp.asarray(fresh["perf_possible"], jnp.float32))
        obs_i = jnp.concatenate([
            jnp.stack([jnp.asarray(fresh["agent_row"], jnp.int32),
                       jnp.asarray(fresh["agent_col"], jnp.int32)]),
            exit_row.astype(jnp.int32), exit_col.astype(jnp.int32),
            exit_valid.astype(jnp.int32),
            fresh["exit_row"].astype(jnp.int32),
            fresh["exit_col"].astype(jnp.int32),
            fresh["exit_valid"].astype(jnp.int32),
            exit_gcol.astype(jnp.int32),
            fresh["exit_gcol"].astype(jnp.int32),
            fresh_ce0.astype(jnp.int32)[None, :]])
        obs_in = [obs_i]
        obs_in_specs = [lane_spec(2 + 8 * k + 1)]
        vh, vw = obs_view
        obs_out_specs = [pl.BlockSpec((vh, vw, block),
                                      lambda i: (0, 0, i),
                                      memory_space=pltpu.VMEM)]
        obs_out_shape = [jax.ShapeDtypeStruct((vh, vw, b), jnp.uint16)]

    if time_limit > 0:
        # Three live boards + three fresh boards in, three boards out —
        # static and dynamic goals alike (the state carries no init_goals
        # leaf; bank.goals[level_idx] recovers the original goal board).
        # The fresh boards are only USED by blocks that reset a lane, so
        # their fetch is gated: a scalar-prefetched per-block resets flag
        # drives their index_map — resetting blocks fetch their own
        # block, all others point at block 0, and the pipeline skips
        # refetching an unchanged block.  Non-resetting steps (the vast
        # majority at time_limit=1000) skip 3 full-board HBM reads, the
        # largest stream cost of the fold path.
        done_out = (jnp.asarray(episode_length, jnp.int32) + 1
                    > time_limit) | game_over | (act_i[3] != 0)
        resets = done_out.reshape(b // block, block).any(axis=1) \
            .astype(jnp.int32)

        def with_prefetch(spec):
            if spec.index_map is None:  # whole-array spec (e.g. SMEM seed)
                return spec
            return pl.BlockSpec(
                spec.block_shape,
                lambda i, r, _m=spec.index_map: _m(i),
                memory_space=pltpu.VMEM)

        fresh_spec = pl.BlockSpec(
            (h, w, block),
            lambda i, r: (0, 0, jnp.where(r[i] != 0, i, 0)),
            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[with_prefetch(sp) for sp in
                      common + act_specs + obs_in_specs
                      + [board_spec] * 3] + [fresh_spec] * 3,
            out_specs=tuple([with_prefetch(sp) for sp in
                             [board_spec] * 3 + obs_out_specs
                             + [lane_spec(8)]]),
        )
        outs = pl.pallas_call(
            partial(kern, reset_prefetch=True),
            grid_spec=grid_spec,
            out_shape=tuple([bshape] * 3 + obs_out_shape
                            + [jax.ShapeDtypeStruct((8, b), jnp.int32)]),
            compiler_params=params,
            interpret=interpret,
        )(resets, seed_arr, si, sf, *act_args, *obs_in,
          board1, goals, init_board,
          fresh["board"], fresh["goals"], fresh["init_board"])
        out_board, out_goals, out_ib, *rest = outs
        adv_i = rest[-1]
        ret = (out_board, out_goals, act_i[0], act_i[1], act_i[2],
               act_i[3].astype(bool), adv_i[0], adv_i[1], adv_i[2],
               adv_i[3].astype(bool), adv_i[4], out_ib)
        return ret + (rest[0],) if emit_obs else ret

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=common + [board_spec] * 3,
        out_specs=(board_spec, board_spec, lane_spec(8)),
        out_shape=(bshape, bshape,
                   jax.ShapeDtypeStruct((8, b), jnp.int32)),
        compiler_params=params,
        interpret=interpret,
    )(seed_arr, si, sf, board1, goals, init_board)
    out_board, out_goals, adv_i = outs
    return (out_board, out_goals, act_i[0], act_i[1], act_i[2],
            act_i[3].astype(bool), adv_i[0], adv_i[1], adv_i[2],
            adv_i[3].astype(bool), adv_i[4])
