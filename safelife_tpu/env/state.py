"""Environment state containers — batched struct-of-arrays pytrees.

The reference keeps one Python ``SafeLifeGame`` object per board
(``safelife_game.py:123-664``); on TPU the whole fleet of environments is a
single pytree of batched arrays so every step is one fused jitted program.
Boards are laid out ``(H, W, B)`` (batch trailing — see ops/life.py).
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import cells as C


def onehot_take(tree, idx):
    """Gather ``tree``'s leaves at trailing-axis indices ``idx`` via one
    MXU one-hot matmul (see LevelBank.take_onehot for why and for the
    HIGHEST-precision requirement).  Module-level so utils/integrity.py
    can golden-test the exact jitted computation the env resets with."""
    leaves, treedef = jax.tree.flatten(tree)
    n = leaves[0].shape[-1]
    b = idx.shape[0]
    flat = [l.reshape(-1, n).astype(jnp.float32) for l in leaves]
    sizes = [f.shape[0] for f in flat]
    mat = jnp.concatenate(flat, axis=0)                   # (R, N)
    onehot = (jnp.arange(n, dtype=jnp.int32)[:, None]
              == idx[None, :]).astype(jnp.float32)         # (N, B)
    out = jax.lax.dot_general(
        mat, onehot, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)               # (R, B)
    picked = []
    off = 0
    for leaf, size in zip(leaves, sizes):
        sl = out[off:off + size].reshape(leaf.shape[:-1] + (b,))
        picked.append(sl.astype(leaf.dtype))
        off += size
    return jax.tree.unflatten(treedef, picked)


class LevelBank(struct.PyTreeNode):
    """A fixed set of levels resident on device, stacked batch-trailing.

    Built from npz archives / procgen by :mod:`safelife_tpu.levels.loader`.
    All levels in one bank share a board shape (torus dynamics depend on
    the shape, so mixed sizes cannot be batched together).

    Everything a reset needs that is a pure function of the level — exit
    locations, baseline performance score, initial points, the reset-time
    exit gate — is precomputed at build time so an in-jit auto-reset is a
    plain gather (no per-step rescoring of fresh levels).
    """
    board: Any        # (H, W, N) uint16
    goals: Any        # (H, W, N) uint16
    agent_row: Any    # (N,) int32
    agent_col: Any    # (N,) int32
    orientation: Any  # (N,) int32
    spawn_prob: Any   # (N,) float32
    min_performance: Any  # (N,) float32
    # Precomputed reset fields:
    exit_row: Any     # (K, N) int32 — exit locations, row-major order
    exit_col: Any     # (K, N) int32
    exit_valid: Any   # (K, N) bool
    # Goal color (3-bit, pre white-removal) at each exit cell.  For
    # static-goal banks this lets the fused obs kernel synthesize the
    # projected exit pixel from per-lane scalars (the exit cell's board
    # value is always LEVEL_EXIT|maybe-red after recoloring) instead of
    # reading the board with a masked reduction per exit.
    exit_gcol: Any    # (K, N) int32
    baseline_score: Any   # (N,) int32 — performance_score of the raw level
    possible0: Any    # (N,) int32 — possible_score(goals) - baseline
    points0: Any      # (N,) int32 — current_points of the raw level
    can_exit0: Any    # (N,) bool — exit gate open at reset
    # True when every level's goal board is a spawner-free CA fixed point:
    # advancing it is the identity, so the env step skips the goals CA
    # entirely (all the *-still benchmark suites).  Static (not a pytree
    # leaf) so jitted steps specialize on it.
    static_goals: bool = struct.field(pytree_node=False, default=False)
    # True when NO level in the bank contains spawner cells: the CA step
    # then skips spawn sampling entirely (the spawn draw is masked by
    # spawner adjacency, so it can never fire) — static so jitted steps
    # specialize.  All the *-still suites qualify.
    spawnless: bool = struct.field(pytree_node=False, default=False)
    # True when every goal board is "simple": no PRESERVING/INHIBITING/
    # SPAWNING/EXIT bits (walls, crates, trees, life are all fine).  The
    # goals CA then collapses — no presence OR-stencil, 4-bit packed
    # count fields (ops/life_pallas._advance_goals_simple), roughly
    # halving the goal advance in dynamic-goals steps.  The invariants
    # are inductive under the rule, so certifying the initial goal boards
    # at bank build certifies every reachable state.  All the *-dynamic
    # suites qualify.  Irrelevant when static_goals.
    simple_goals: bool = struct.field(pytree_node=False, default=False)
    # True when every goal board is free of PRESERVING/INHIBITING/EXIT
    # bits but MAY contain spawners (strictly weaker than simple_goals).
    # The fused step then advances the board+goals pair with two packed
    # neighbor-sum stencils instead of three: the board word carries its
    # own presence fields and both boards' spawner-presence counts ride
    # the goal word's free bits (ops/life_pallas._advance_pair_spawn-
    # simple).  Inductive like simple_goals: spawned/born cells only add
    # ALIVE|DESTRUCTIBLE|colors, and frozen spawners never change.
    spawn_simple_goals: bool = struct.field(pytree_node=False, default=False)

    @property
    def num_levels(self):
        return self.board.shape[-1]

    @property
    def board_shape(self):
        return self.board.shape[:2]

    def take(self, idx):
        """Gather a batch of levels by index -> leaves with trailing B."""
        return jax.tree.map(
            lambda x: jnp.take(x, idx, axis=-1), self)

    def take_onehot(self, idx):
        """MXU one-hot gather of a batch of levels (TPU fast path).

        ``take`` lowers to a traced-index gather along the trailing axis —
        pathological on TPU (~10x a CA advance per call).  Here every leaf
        is flattened into one (R, N) float32 matrix and the batch gather
        becomes a single (R, N) x (N, B) matmul with a one-hot selector:
        ~100x faster on the MXU.  Exact ONLY with ``Precision.HIGHEST``:
        each output element is a sum with exactly one nonzero term and all
        leaf values (u16 boards, small ints, f32 scalars) are representable
        in f32, but DEFAULT matmul precision on TPU feeds the MXU bf16-
        rounded inputs (8-bit significand), which silently strips the low
        bits of any cell value above 255 — e.g. green life 0x0611 ->
        0x0610 loses its ALIVE bit.  On 2026-08-19 exactly that corrupted
        every reset of a full training sweep (red prune targets arrived
        pre-dead, fabricating perfect prune scores) while the CA kernels
        and the integrity guard's then-separate matmul probe stayed
        clean; ``utils/integrity.py`` now runs THIS method on a rich
        fixture bank so any future precision regression aborts the run.
        HIGHEST costs ~6 MXU passes instead of 1 — irrelevant here, the
        gather is amortized once per rollout (env.sample_fresh_levels).
        """
        return onehot_take(self, idx)


class EnvState(struct.PyTreeNode):
    """Full state of B lockstep SafeLife environments."""
    # Live game state
    board: Any        # (H, W, B) uint16
    goals: Any        # (H, W, B) uint16
    agent_row: Any    # (B,) int32
    agent_col: Any    # (B,) int32
    orientation: Any  # (B,) int32
    game_over: Any    # (B,) bool  (agent exited / aborted)
    # Per-level constants (change only on reset).  There is deliberately
    # no init_goals plane: the original goal board never feeds the hot
    # step, and ``bank.goals`` at ``level_idx`` recovers it for cold-path
    # consumers — carrying it would cost the fused kernel three extra
    # full-board HBM streams per step on dynamic-goal banks.
    init_board: Any   # (H, W, B) uint16 — revert/scoring/side-effect baseline
    spawn_prob: Any   # (B,) float32
    min_performance: Any  # (B,) float32
    baseline_score: Any   # (B,) int32 — perf score of the initial state
    exit_row: Any     # (K, B) int32 — exit locations (row-major order)
    exit_col: Any     # (K, B) int32
    exit_valid: Any   # (K, B) bool
    exit_gcol: Any    # (K, B) int32 — goal color at each exit cell
    level_idx: Any    # (B,) int32 — bank index being played
    # Episode bookkeeping
    points_last: Any      # (B,) int32 — cached current_points for the delta
    perf_completed: Any   # (B,) int32 — cached performance vs baseline
    perf_possible: Any    # (B,) int32 — cached max-possible vs baseline
    episode_length: Any   # (B,) int32
    episode_reward: Any   # (B,) float32
    episode_done: Any     # (B,) bool — done flag of the previous step
    reset_count: Any      # (B,) int32 — resets so far (level sequencing)
    # Global counters (reference: SafeLifeEnv.global_counter)
    episodes_started: Any    # () int32
    episodes_completed: Any  # () int32
    num_steps: Any           # () int32

    @property
    def batch_size(self):
        return self.board.shape[-1]

    @property
    def board_shape(self):
        return self.board.shape[:2]


def find_exits_np(board, max_exits):
    """Host (numpy) exit finder used at bank build time.

    board: (H, W) uint16 -> (K,) rows, cols, valid.
    """
    board = np.asarray(board)
    rr, cc = np.nonzero((board & C.EXIT) != 0)
    k = min(max_exits, len(rr))
    rows = np.zeros(max_exits, np.int32)
    cols = np.zeros(max_exits, np.int32)
    valid = np.zeros(max_exits, bool)
    rows[:k], cols[:k], valid[:k] = rr[:k], cc[:k], True
    return rows, cols, valid


def find_exits(board, max_exits):
    """Locate up to ``max_exits`` exit cells per board, in row-major order.

    board: (H, W, B) uint16 -> (K, B) rows, cols, valid.
    """
    h, w, b = board.shape
    flat = ((board & C.EXIT) != 0).reshape(h * w, b)
    idx = jnp.arange(h * w, dtype=jnp.int32)[:, None]
    # Score so that top_k returns the *first* exits in row-major order.
    score = jnp.where(flat, h * w - idx, 0)
    vals, pos = jax.lax.top_k(score.T, max_exits)  # (B, K), descending score
    valid = (vals > 0).T
    pos = pos.T.astype(jnp.int32)
    return pos // w, pos % w, valid
