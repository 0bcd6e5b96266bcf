"""Fused Pallas TPU kernel: one VMEM pass advancing board AND goals.

The XLA version (:mod:`safelife_tpu.ops.life`) materializes every torus roll
in HBM (~150 MB of traffic per call at B=4096); this kernel keeps the whole
(H, W, 128-lane) block plus all stencil intermediates in VMEM, reads each
board exactly once and writes it exactly once, and draws its spawn
randomness from the in-core PRNG — so both the board and goal advances of an
env step (reference ``safelife_game.py:657-660`` stepping both through
``advance_board.c``) cost one HBM round-trip of the state.

Layout: boards are (H, W, B) uint16 with the batch on the 128-wide lane
axis; the grid tiles B into lanes-of-128 blocks (B % 128 == 0 — pad the
batch otherwise).  H and W live on sublanes, so all 3x3 stencil shifts are
VMEM-local data movement.

Randomness: fast-path only.  Spawn fires where ``u < spawn_prob`` with
``u`` drawn from ``pltpu.prng_random_bits`` seeded per (step, block); the
bit-exact parity path (host MT19937 stream) stays on the XLA kernel, which
accepts precomputed spawn fields.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cells as C

LANES = 128


def _nb_sum(x):
    """3x3 torus neighbor sum (self included) on an (H, W, L) block."""
    h, w = x.shape[0], x.shape[1]
    r = x + pltpu.roll(x, 1, 1) + pltpu.roll(x, w - 1, 1)
    return r + pltpu.roll(r, 1, 0) + pltpu.roll(r, h - 1, 0)


def _pis_word(board, shift=0, spawning=True):
    """PRESERVING/INHIBITING(/SPAWNING) presence deposits as 4-bit count
    fields at bits ``shift``/``shift+4``(/``shift+8``).

    The three flag bits are adjacent (cells.py: 5, 6, 7), so one multiply
    spreads them to 4-bit field spacing (partial products of
    2^0 + 2^3 + 2^6 land uniquely on the masked positions {0, 4, 8}).
    Summing these fields over the 3x3 neighborhood (max count 9 < 16, no
    inter-field carry) makes each "field != 0" test equal the OR-stencil
    the rule needs — which lets the presence pass ride an existing
    nb_sum word instead of costing its own nb_or stencil."""
    pis3 = (board >> C.PRESERVING_BIT) & (7 if spawning else 3)
    return ((pis3 * 0x49) & 0x111) << shift


def _advance_core(board, spawn, preserved, inhibited, near_spawner):
    """The CA rule on an (H, W, L) int32 block given precomputed
    3x3-neighborhood presence predicates (each (H, W, L) bool, self
    included); mirrors ops/life.py.  Callers obtain the predicates from a
    :func:`_pis_word` count stencil — standalone boards pay one extra
    nb_sum (what the old OR-stencil cost), paired boards share a single
    presence word between both advances (see _advance_pair).

    ``spawn=None`` compiles the spawner-free rule (no sampling, color
    weights without the spawner boost) for banks with no spawner cells —
    the spawn draw is masked by spawner adjacency, so on such boards it
    can never fire and the arithmetic is pure waste."""
    alive = board & 1
    if spawn is None:
        cw = alive
    else:
        spawning = (board >> C.SPAWNING_BIT) & 1
        cw = alive + 2 * spawning
    # The three color bits spread to 5-bit field spacing (r@0, g@5, b@10)
    # with one multiply: partial products of (2^0 + 2^4 + 2^8) land
    # uniquely on the masked positions {0, 5, 10}, so one mask recovers
    # the deposit — then a single multiply by cw weights all three fields.
    c3 = (board >> C.COLOR_BIT) & 7
    spread = (c3 * 0x111) & 0x421
    has_d = ((board >> C.DESTRUCTIBLE_BIT) | (board >> C.EXIT_BIT)) & 1

    packed = (alive
              + ((spread * cw) << 5)
              + ((has_d * alive) << 20))

    counts = _nb_sum(packed)
    n_alive = counts & 31
    # "field >= 2" for the four 5-bit count fields (r@5, g@10, b@15, d@20):
    # keep each field's bits above its unit bit, OR-fold them onto the
    # field base, then deposit the three color answers straight into the
    # COLOR_R/G/B bit positions with one multiply (unique partial
    # products on the masked positions, as in the packing above).
    m = (counts >> 1) & ((15 << 5) | (15 << 10) | (15 << 15) | (15 << 20))
    m = m | (m >> 2)
    m = m | (m >> 1)
    t = m & ((1 << 5) | (1 << 10) | (1 << 15))
    inherit = ((t >> 4) * 0x111) & C.COLORS

    is_alive = alive != 0
    frozen = (board & C.FROZEN) != 0
    three = n_alive == 3
    survives = frozen | preserved | three | (n_alive == 4)
    born = three & ~frozen & ~inhibited
    born_cell = C.ALIVE | inherit | ((m >> 17) & C.DESTRUCTIBLE)

    if spawn is None:
        return jnp.where(
            is_alive, jnp.where(survives, board, 0),
            jnp.where(born, born_cell, board))

    spawned = ~frozen & ~inhibited & ~born & near_spawner & spawn
    spawn_cell = (C.ALIVE | C.DESTRUCTIBLE) | inherit

    return jnp.where(
        is_alive,
        jnp.where(survives, board, 0),
        jnp.where(born, born_cell, jnp.where(spawned, spawn_cell, board)),
    )


def _pis_predicates(counts, shift, spawning=True):
    """Presence predicates from a summed :func:`_pis_word` at ``shift``."""
    preserved = ((counts >> shift) & 15) != 0
    inhibited = ((counts >> (shift + 4)) & 15) != 0
    near_spawner = ((counts >> (shift + 8)) & 15) != 0 if spawning else None
    return preserved, inhibited, near_spawner


# ---------------------------------------------------------------------------
# Single-word full-rule packings.
#
# The original full-rule advance spent TWO neighbor-sum stencils per board:
# one for the packed rule counts (alive / 3 color weights / destructible at
# 5-bit spacing, bits 0-24) and one for the PRESERVING/INHIBITING/SPAWNING
# presence fields.  But every count a full board needs fits in ONE int32
# word once the fields are sized to their true maxima:
#
#   * spawnless board (color weight = alive <= 1, counts <= 9): 4-bit
#     fields — alive@0, r@4, g@8, b@12, d@16, p@20, i@24 — 28 bits.  The
#     whole rule costs a single neighbor-sum pass (the headline *-still
#     suites advance ONE board per step, so their CA stencil work halves).
#   * spawner board (color weight <= 3, counts <= 27): 5-bit color fields —
#     alive@0(4b), r@4, g@9, b@14, d@19(4b), p@23(4b), i@27(4b) — 31 bits.
#     Only the spawner-presence field is homeless; a paired advance parks
#     it in the partner word's free bits (see _advance_pair_spawnsimple).
#
# All deposits use the multiply-spread trick (partial products of a sparse
# multiplier land uniquely on the masked positions); every field's 3x3 sum
# stays below its width (no inter-field carries) and the top field tops out
# below bit 31 (no sign trouble).  Reference semantics being reproduced:
# speedups_src/advance_board.c:34-120 (via ops/life.py, tested bit-equal).
# ---------------------------------------------------------------------------

def _fold_ge2(counts, mask):
    """OR-fold each masked count field's bits-above-unit onto its base bit:
    after this, ``m & (1 << base)`` tests "field value >= 2"."""
    m = (counts >> 1) & mask
    m = m | (m >> 2)
    return m | (m >> 1)


def _pack_full4(board):
    """Spawnless full-rule board -> one 28-bit count word (4-bit fields)."""
    alive = board & 1
    c3 = (board >> C.COLOR_BIT) & 7
    spread = (c3 * 0x49) & 0x111                      # r@0, g@4, b@8
    has_d = ((board >> C.DESTRUCTIBLE_BIT) | (board >> C.EXIT_BIT)) & 1
    pi2 = (board >> C.PRESERVING_BIT) & 3
    # pi deposit: partial products of 2^20 + 2^23 land uniquely on {20, 24}.
    return (alive + ((spread * alive) << 4) + ((has_d * alive) << 16)
            + ((pi2 * 0x900000) & 0x1100000))


def _extract4(counts):
    n_alive = counts & 15
    m = _fold_ge2(counts, (7 << 4) | (7 << 8) | (7 << 12) | (7 << 16))
    t = m & ((1 << 4) | (1 << 8) | (1 << 12))
    inherit = ((t >> 3) * 0x124) & C.COLORS
    born_d = (m >> 13) & C.DESTRUCTIBLE
    preserved = ((counts >> 20) & 15) != 0
    inhibited = ((counts >> 24) & 15) != 0
    return n_alive, inherit, born_d, preserved, inhibited


def _pack_full5(board, with_pi=True):
    """Spawner full-rule board -> one 31-bit count word (5-bit colors;
    spawner-presence NOT included — pair it via a partner word)."""
    alive = board & 1
    spawning = (board >> C.SPAWNING_BIT) & 1
    cw = alive + 2 * spawning
    c3 = (board >> C.COLOR_BIT) & 7
    spread = (c3 * 0x1110) & 0x4210                   # r@4, g@9, b@14
    has_d = ((board >> C.DESTRUCTIBLE_BIT) | (board >> C.EXIT_BIT)) & 1
    word = alive + spread * cw + ((has_d * alive) << 19)
    if with_pi:
        pi2 = (board >> C.PRESERVING_BIT) & 3
        # pi deposit: partial products of 2^23 + 2^26 land on {23, 27}.
        word = word + ((pi2 * 0x4800000) & 0x8800000)
    return word


def _extract5(counts, with_pi=True):
    n_alive = counts & 15
    m = _fold_ge2(counts, (15 << 4) | (15 << 9) | (15 << 14) | (7 << 19))
    t = m & ((1 << 4) | (1 << 9) | (1 << 14))
    inherit = ((t >> 4) * 0x222) & C.COLORS
    born_d = (m >> 16) & C.DESTRUCTIBLE
    if not with_pi:
        return n_alive, inherit, born_d, None, None
    preserved = ((counts >> 23) & 15) != 0
    inhibited = ((counts >> 27) & 15) != 0
    return n_alive, inherit, born_d, preserved, inhibited


def _core_full(board, spawn, n_alive, inherit, born_d, preserved, inhibited,
               near_spawner):
    """The CA rule given pre-extracted neighborhood quantities.  Same
    semantics as :func:`_advance_core`; ``preserved``/``inhibited`` may be
    None when certified absent (goal boards with no PRESERVING/INHIBITING
    anywhere — the predicates are constant-False and compile out)."""
    is_alive = (board & 1) != 0
    frozen = (board & C.FROZEN) != 0
    three = n_alive == 3
    survives = frozen | three | (n_alive == 4)
    if preserved is not None:
        survives = survives | preserved
    born = three & ~frozen
    if inhibited is not None:
        born = born & ~inhibited
    born_cell = C.ALIVE | inherit | born_d
    if spawn is None:
        return jnp.where(
            is_alive, jnp.where(survives, board, 0),
            jnp.where(born, born_cell, board))
    spawned = ~frozen & ~born & near_spawner & spawn
    if inhibited is not None:
        spawned = spawned & ~inhibited
    spawn_cell = (C.ALIVE | C.DESTRUCTIBLE) | inherit
    return jnp.where(
        is_alive,
        jnp.where(survives, board, 0),
        jnp.where(born, born_cell, jnp.where(spawned, spawn_cell, board)),
    )


def _advance_spawnless(board):
    """Full-rule advance of a spawnless board in ONE neighbor-sum pass."""
    return _core_full(board, None, *_extract4(_nb_sum(_pack_full4(board))),
                      near_spawner=None)


def _advance_pair_spawnsimple(board, spawn_b, goals, spawn_g):
    """Advance a full-rule board AND a *spawn-simple* goal board (certified
    free of PRESERVING/INHIBITING/EXIT bits, spawners allowed — see
    ``LevelBank.spawn_simple_goals``; the certification is inductive, as
    spawned/born cells only ever add ALIVE|DESTRUCTIBLE|colors) with TWO
    neighbor-sum stencils instead of the general pair's three: the board
    word carries its own p/i fields (_pack_full5) and both boards'
    spawner-presence fields ride the goal word's free bits 23/27."""
    wb = _pack_full5(board, with_pi=True)
    s_g = (goals >> C.SPAWNING_BIT) & 1
    s_b = (board >> C.SPAWNING_BIT) & 1
    wg = _pack_full5(goals, with_pi=False) + (s_g << 23) + (s_b << 27)
    cb = _nb_sum(wb)
    cg = _nb_sum(wg)
    near_g = ((cg >> 23) & 15) != 0
    near_b = ((cg >> 27) & 15) != 0
    na, inh, bd, p, i = _extract5(cb, with_pi=True)
    new_b = _core_full(board, spawn_b, na, inh, bd, p, i, near_b)
    na, inh, bd, _, _ = _extract5(cg, with_pi=False)
    new_g = _core_full(goals, spawn_g, na, inh, bd, None, None, near_g)
    return new_b, new_g


def _advance_block(board, spawn):
    """Standalone full-rule advance of one board.  Spawnless boards take
    the single-stencil 4-bit packing; spawner boards keep the two-stencil
    layout (their 35 bits of count fields cannot fit one word)."""
    if spawn is None:
        return _advance_spawnless(board)
    counts = _nb_sum(_pis_word(board, 0, spawning=True))
    p, i, s = _pis_predicates(counts, 0, spawning=True)
    return _advance_core(board, spawn, p, i, s)


def _advance_pair(board, spawn_b, goals, spawn_g):
    """Advance two full-rule boards with ONE shared presence stencil:
    the board's p/i/s count fields ride bits 0-11 and the goals' bits
    12-23 of a single word, so the pair costs 3 neighbor-sum passes
    instead of the 4 two standalone advances would (the goal-spawner
    stress case's hot path)."""
    sb = spawn_b is not None
    sg = spawn_g is not None
    word = _pis_word(board, 0, spawning=sb) | _pis_word(goals, 12,
                                                        spawning=sg)
    counts = _nb_sum(word)
    pb, ib, nsb = _pis_predicates(counts, 0, spawning=sb)
    pg, ig, nsg = _pis_predicates(counts, 12, spawning=sg)
    return (_advance_core(board, spawn_b, pb, ib, nsb),
            _advance_core(goals, spawn_g, pg, ig, nsg))


def _advance_goals_simple(goals, extra=None):
    """The CA rule on a *certified simple* goal board: no PRESERVING,
    INHIBITING, SPAWNING or EXIT bits anywhere (certified at bank build —
    see ``LevelBank.simple_goals``; walls, crates, trees and plain life
    are all fine).

    Under those invariants the general rule collapses: nothing is
    preserved or inhibited, spawn can never fire (no spawner adjacency),
    and the destructible-parent count only needs the DESTRUCTIBLE bit
    (EXIT is absent).  The presence OR-stencil disappears entirely and
    the packed neighbor word shrinks to five 4-bit fields, roughly
    halving the cost of the goal advance in the dynamic-goals step.  The
    invariants are inductive — born cells are ALIVE|colors|maybe
    DESTRUCTIBLE, spawn never fires — so certifying the initial goal
    boards certifies every reachable one, and the result is bit-exact vs
    :func:`_advance_block` on such boards (tested).
    """
    alive = goals & 1
    c3 = (goals >> C.COLOR_BIT) & 7
    spread = (c3 * 0x49) & 0x111           # color bits at r@0, g@4, b@8
    has_d = (goals >> C.DESTRUCTIBLE_BIT) & alive
    packed = alive + ((spread * alive) << 4) + (has_d << 16)
    if extra is not None:
        # Rider fields from a paired full-rule advance (bits 20+; the
        # simple packing tops out at bit 19) — summed along for free.
        packed = packed | extra

    counts = _nb_sum(packed)

    n_alive = counts & 15
    # per-field ">= 2" fold, then one multiply deposits r/g/b into the
    # COLOR bit positions (unique partial products on masked positions).
    m = (counts >> 1) & ((7 << 4) | (7 << 8) | (7 << 12) | (7 << 16))
    m = m | (m >> 1)
    m = m | (m >> 1)
    t = m & ((1 << 4) | (1 << 8) | (1 << 12))
    inherit = ((t >> 3) * 0x124) & C.COLORS

    is_alive = alive != 0
    frozen = (goals & C.FROZEN) != 0
    three = n_alive == 3
    survives = frozen | three | (n_alive == 4)
    born = three & ~frozen
    born_cell = C.ALIVE | inherit | ((m >> 13) & C.DESTRUCTIBLE)
    out = jnp.where(
        is_alive, jnp.where(survives, goals, 0),
        jnp.where(born, born_cell, goals))
    return out if extra is None else (out, counts)


def _advance_with_simple_goals(board, spawn, goals):
    """Advance a full-rule board AND its certified-simple goal board with
    ONE shared stencil pass beyond the board's own: the board's p/i/s
    presence fields ride the simple goal packing's free bits 20/24/28
    (its own fields top out at bit 19), so the pair costs 2 neighbor-sum
    passes instead of 3.  The spawning field can reach bit 31 — harmless:
    counts stay <= 9 per field, two's-complement addition is bitwise
    exact through the sign bit and extraction masks after the shift."""
    spawning = spawn is not None
    extra = _pis_word(board, 20, spawning=spawning)
    goals_out, counts = _advance_goals_simple(goals, extra)
    p, i, s = _pis_predicates(counts, 20, spawning=spawning)
    return _advance_core(board, spawn, p, i, s), goals_out


def _spawn_field(shape, thresh24):
    """Boolean spawn field: 24-bit uniform < per-lane threshold."""
    bits = pltpu.prng_random_bits(shape)  # uint32
    u24 = (pltpu.bitcast(bits, jnp.int32) >> 8) & 0x00FFFFFF
    return u24 < thresh24


def _spawn_field_pair(shape, thresh16):
    """TWO independent spawn fields from ONE in-core PRNG draw: the low
    and high 16-bit halves of each 32-bit word against a 16-bit
    threshold.  Used where board and goals both sample spawns in one step
    (the goal-spawner stress case) — halves the PRNG cost.  16-bit
    quantization bounds the probability error at 2^-16 (< 5e-5 relative
    for the standard 0.3 rate); the bit-exact parity path injects host
    MT19937 fields and never takes this code."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    return (bits & 0xFFFF) < thresh16, ((bits >> 16) & 0xFFFF) < thresh16


def _kernel(seed_ref, prob_ref, board_ref, goals_ref, out_b_ref, out_g_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    thresh16 = (prob_ref[:] * jnp.float32(1 << 16)).astype(jnp.int32)  # (1, L)
    shape = board_ref.shape

    board = board_ref[:].astype(jnp.int32)
    goals = goals_ref[:].astype(jnp.int32)
    spawn_b, spawn_g = _spawn_field_pair(shape, thresh16[None, :, :])
    new_b, new_g = _advance_pair(board, spawn_b, goals, spawn_g)
    out_b_ref[:] = new_b.astype(jnp.uint16)
    out_g_ref[:] = new_g.astype(jnp.uint16)


@partial(jax.jit, static_argnames=("interpret",))
def advance_both(board, goals, spawn_prob, seed, interpret=False):
    """Advance board and goals one CA step in one fused VMEM pass.

    board, goals: (H, W, B) uint16 with B % 128 == 0.
    spawn_prob: (B,) float32.  seed: () int32 (vary per step!).
    """
    h, w, b = board.shape
    assert b % LANES == 0, f"batch {b} must be a multiple of {LANES}"
    block = LANES
    grid = (b // block,)
    board_spec = pl.BlockSpec((h, w, block), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    prob_spec = pl.BlockSpec((1, block), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((h, w, b), jnp.uint16)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            prob_spec,
            board_spec, board_spec,
        ],
        out_specs=(board_spec, board_spec),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(jnp.asarray(seed, jnp.int32).reshape(1),
      jnp.asarray(spawn_prob, jnp.float32).reshape(1, b),
      board, goals)


def _simple_kernel(goals_ref, out_ref):
    out_ref[:] = _advance_goals_simple(
        goals_ref[:].astype(jnp.int32)).astype(jnp.uint16)


@partial(jax.jit, static_argnames=("interpret",))
def advance_simple(goals, interpret=False):
    """Run the collapsed simple-goals rule standalone (test hook).

    goals: (H, W, B) uint16 certified simple (see LevelBank.simple_goals);
    equals the full rule with no spawn on such boards.
    """
    h, w, b = goals.shape
    assert b % LANES == 0
    spec = pl.BlockSpec((h, w, LANES), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _simple_kernel,
        grid=(b // LANES,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, w, b), jnp.uint16),
        interpret=interpret,
    )(goals)


def _pair_field_kernel(board_ref, sb_ref, goals_ref, sg_ref,
                       out_b_ref, out_g_ref):
    b, g = _advance_pair_spawnsimple(
        board_ref[:].astype(jnp.int32), sb_ref[:] != 0,
        goals_ref[:].astype(jnp.int32), sg_ref[:] != 0)
    out_b_ref[:] = b.astype(jnp.uint16)
    out_g_ref[:] = g.astype(jnp.uint16)


@partial(jax.jit, static_argnames=("interpret",))
def advance_pair_spawnsimple_with_fields(board, spawn_b, goals, spawn_g,
                                         interpret=False):
    """Test hook: run the two-stencil spawn-simple pair advance with
    caller-supplied spawn fields — for bit-equality tests against the XLA
    rule (``ops.life.advance_board`` per board).  ``goals`` must satisfy
    the spawn-simple certification (no PRESERVING/INHIBITING/EXIT bits)."""
    h, w, b = board.shape
    assert b % LANES == 0
    spec = pl.BlockSpec((h, w, LANES), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((h, w, b), jnp.uint16)
    return pl.pallas_call(
        _pair_field_kernel,
        grid=(b // LANES,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(out, out),
        interpret=interpret,
    )(board, spawn_b.astype(jnp.uint16), goals, spawn_g.astype(jnp.uint16))


def _spawnless_kernel(board_ref, out_ref):
    out_ref[:] = _advance_spawnless(
        board_ref[:].astype(jnp.int32)).astype(jnp.uint16)


@partial(jax.jit, static_argnames=("interpret",))
def advance_spawnless(board, interpret=False):
    """Test hook: the single-stencil spawnless full-rule advance (the
    headline *-still path) standalone — bit-equal to the XLA rule with a
    never-firing spawn field on spawner-free boards."""
    h, w, b = board.shape
    assert b % LANES == 0
    spec = pl.BlockSpec((h, w, LANES), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _spawnless_kernel,
        grid=(b // LANES,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, w, b), jnp.uint16),
        interpret=interpret,
    )(board)


def _field_kernel(board_ref, spawn_ref, out_ref):
    out_ref[:] = _advance_block(
        board_ref[:].astype(jnp.int32), spawn_ref[:] != 0).astype(jnp.uint16)


@partial(jax.jit, static_argnames=("interpret",))
def advance_with_field(board, spawn, interpret=False):
    """Advance boards one CA step with a caller-supplied spawn field.

    This runs the exact ``_advance_block`` the fused kernels use, but with
    the randomness injected (like :func:`safelife_tpu.ops.life.advance_board`)
    instead of drawn in-core — the hook for bit-exact equivalence tests of
    the Pallas rule implementation against the XLA path and the C-engine
    goldens (``speedups_src/advance_board.c:34-120``).

    board: (H, W, B) uint16, B % 128 == 0.  spawn: same shape, bool.
    """
    h, w, b = board.shape
    assert b % LANES == 0, f"batch {b} must be a multiple of {LANES}"
    board_spec = pl.BlockSpec((h, w, LANES), lambda i: (0, 0, i),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _field_kernel,
        grid=(b // LANES,),
        in_specs=[board_spec, board_spec],
        out_specs=board_spec,
        out_shape=jax.ShapeDtypeStruct((h, w, b), jnp.uint16),
        interpret=interpret,
    )(board, spawn.astype(jnp.uint16))


def interpret_params():
    """Interpret-mode token that emulates the TPU primitives (in-core PRNG,
    ``pltpu.roll``) on any backend — lets CI run the fused kernels on CPU."""
    return pltpu.InterpretParams()


def available(batch_size=None):
    """True when the fused kernel can run here (TPU + lane-aligned batch)."""
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return on_tpu and (batch_size is None or batch_size % LANES == 0)
