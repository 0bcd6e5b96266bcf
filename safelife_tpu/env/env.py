"""The batched, fully on-device SafeLife environment.

One jitted :meth:`BatchedSafeLifeEnv.step` advances B environments in
lockstep: agent actions, two CA advances (board + goals), reward, exit
gating/recoloring, episode bookkeeping, auto-reset from a device-resident
level bank, and observation extraction — with no host round-trips.

Reference semantics being fused here (file:line into /root/reference):
  * env step order:      safelife/safelife_env.py:157-186
  * reset:               safelife/safelife_env.py:188-198
  * exit gating/recolor: safelife/safelife_game.py:522-537
  * auto-reset:          env_wrappers.py:289-303 (ContinuingEnv, native here)
  * counters:            safelife_env.py:81-85,171-175
"""

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .. import cells as C
from ..ops import agent as agent_ops
from ..ops import env_step_pallas, life, life_pallas, obs as obs_ops, scoring
from .state import EnvState, LevelBank

ACTION_NAMES = (
    "NULL",
    "MOVE UP", "MOVE RIGHT", "MOVE DOWN", "MOVE LEFT",
    "TOGGLE UP", "TOGGLE RIGHT", "TOGGLE DOWN", "TOGGLE LEFT",
)
NUM_ACTIONS = len(ACTION_NAMES)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (hashable; closed over by jit)."""
    view_shape: Tuple[int, int] = (15, 15)
    output_channels: Optional[Tuple[int, ...]] = tuple(range(15))
    remove_white_goals: bool = True
    time_limit: int = 1000
    auto_reset: bool = True
    sequential_levels: bool = False  # round-robin bank order (benchmarking)
    points_on_level_exit: float = 1.0
    can_toggle_powers: bool = False
    can_toggle_colors: bool = False
    compute_obs: bool = True
    use_pallas: bool = True  # fused CA kernel on TPU (fast path only)
    # Force the fused Pallas path in interpret mode (TPU emulation on any
    # backend) — CI uses this to test the kernels bit-for-bit on CPU.
    pallas_interpret: bool = False


class TimeStep(struct.PyTreeNode):
    obs: Any        # (B, vh, vw, C) uint8 (or None if compute_obs=False)
    reward: Any     # (B,) float32
    done: Any       # (B,) bool
    times_up: Any   # (B,) bool
    # Pre-reset episode stats (valid where done):
    episode_length: Any   # (B,) int32
    episode_reward: Any   # (B,) float32
    perf_completed: Any   # (B,) int32
    perf_possible: Any    # (B,) int32
    level_idx: Any        # (B,) int32
    # Pre-reset side-effect cell count (SimpleSideEffectPenalty semantics):
    # computed in-kernel on the fused path, by ops/scoring.side_effect_count
    # on the XLA path.  Logged per finished episode by the trainer.
    side_effect_count: Any = None
    # Full post-step state BEFORE any auto-reset.  Wrappers (movement bonus,
    # side-effect penalty, recorders) need the pre-reset board/agent; under
    # jit these are references into the fused program — unused leaves are
    # dead-code-eliminated, so carrying the whole state costs nothing.
    # NOTE: on the fused auto-reset path the four BOARD leaves are already
    # post-reset (the reset select is folded into the kernel); the per-lane
    # scalars remain pre-reset and side_effect_count is provided instead.
    state_before_reset: Any = None


class BatchedSafeLifeEnv:
    """Functional batched environment; all methods are jit-compatible."""

    def __init__(self, config: EnvConfig = EnvConfig()):
        self.config = config

    # Hash/eq by config so jit caches compile across env instances.
    def __hash__(self):
        return hash(self.config)

    def __eq__(self, other):
        return (type(other) is type(self)
                and other.config == self.config)

    # -- resets ----------------------------------------------------------

    def _next_level_idx(self, num_levels, batch, reset_count, key):
        if self.config.sequential_levels:
            # env b plays levels b, b+B, b+2B, ... — the reference's
            # round-robin eval order (benchmarking.py:80-106).
            rank = jnp.arange(batch, dtype=jnp.int32)
            return (rank + reset_count * batch) % num_levels
        return jax.random.randint(key, (batch,), 0, num_levels)

    def _fresh_state_fields(self, bank: LevelBank, idx):
        """Per-board fields of a freshly-reset state (no counters).

        Pure gathers: every reset-time quantity is precomputed in the bank,
        so an in-jit auto-reset costs one gather pass over the level arrays.
        """
        lv = bank.take_onehot(idx)
        init_board = lv.board
        # update_exit_colors at reset: exits closed unless immediately open.
        board = _recolor_exits(init_board, init_board, lv.can_exit0)
        batch = idx.shape[0]
        return dict(
            board=board, goals=lv.goals,
            agent_row=lv.agent_row.astype(jnp.int32),
            agent_col=lv.agent_col.astype(jnp.int32),
            orientation=lv.orientation.astype(jnp.int32),
            game_over=jnp.zeros(batch, bool),
            init_board=init_board,
            spawn_prob=lv.spawn_prob.astype(jnp.float32),
            min_performance=lv.min_performance.astype(jnp.float32),
            baseline_score=lv.baseline_score,
            exit_row=lv.exit_row, exit_col=lv.exit_col,
            exit_valid=lv.exit_valid, exit_gcol=lv.exit_gcol,
            level_idx=idx.astype(jnp.int32),
            points_last=lv.points0,
            perf_completed=jnp.zeros(batch, jnp.int32),
            perf_possible=lv.possible0,
            episode_length=jnp.zeros(batch, jnp.int32),
            episode_reward=jnp.zeros(batch, jnp.float32),
            episode_done=jnp.zeros(batch, bool),
        )

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def reset_all(self, bank: LevelBank, batch_size: int, key) -> EnvState:
        idx = self._next_level_idx(
            bank.num_levels, batch_size, jnp.zeros(batch_size, jnp.int32), key)
        fields = self._fresh_state_fields(bank, idx)
        return EnvState(
            reset_count=jnp.ones(batch_size, jnp.int32),
            episodes_started=jnp.int32(batch_size),
            episodes_completed=jnp.int32(0),
            num_steps=jnp.int32(0),
            **fields)

    @partial(jax.jit, static_argnames=("self",))
    def reset_to_levels(self, bank: LevelBank, idx) -> EnvState:
        """Deterministic reset: env b plays bank level ``idx[b]``."""
        idx = jnp.asarray(idx, jnp.int32)
        batch = idx.shape[0]
        fields = self._fresh_state_fields(bank, idx)
        return EnvState(
            reset_count=jnp.ones(batch, jnp.int32),
            episodes_started=jnp.int32(batch),
            episodes_completed=jnp.int32(0),
            num_steps=jnp.int32(0),
            **fields)

    # -- observations ----------------------------------------------------

    def observe(self, state: EnvState):
        return obs_ops.observe(
            state.board, state.goals, state.agent_row, state.agent_col,
            state.exit_row, state.exit_col, state.exit_valid,
            self.config.view_shape, self.config.output_channels,
            self.config.remove_white_goals)

    # -- step ------------------------------------------------------------

    @partial(jax.jit, static_argnames=("self", "batch_size"))
    def sample_fresh_levels(self, bank: LevelBank, batch_size: int, key):
        """Pre-gather one fresh level per env for upcoming auto-resets.

        The per-step bank gather is the single most expensive part of an
        auto-resetting step (a (H, W, B) gather costs ~10x the CA advance);
        sampling the *next* level for every env once per rollout and
        passing it to :meth:`step` as ``fresh_levels`` amortizes it over
        the rollout length.  An env that resets twice within one rollout
        replays the same (randomly chosen) level.  Measured duplicate-
        replay rates (tests/test_reset_aliasing.py): < 2% of resets at
        episode length >= 5x the rollout (the training regime — reference
        time_limit=1000 vs T=20; trained episodes run 100-1000 steps),
        but large when episodes are shorter than the rollout — pass
        ``fresh_levels=None`` there for exact per-step resampling.
        """
        idx = jax.random.randint(key, (batch_size,), 0, bank.num_levels)
        return idx, self._fresh_state_fields(bank, idx)

    @partial(jax.jit, static_argnames=("self",))
    def step(self, state: EnvState, bank: LevelBank, action, key,
             spawn_board=None, spawn_goals=None, fresh_levels=None):
        """Advance all B environments one step.

        ``spawn_board`` / ``spawn_goals`` override the on-device spawn
        randomness with precomputed boolean fields (bit-exact parity path).
        ``fresh_levels`` (from :meth:`sample_fresh_levels`) supplies the
        pre-gathered reset levels for the fast path.
        """
        cfg = self.config
        prev_done = state.episode_done
        prev_over = state.game_over

        # Exit gate as of action time.  The performance ratio of the current
        # board is cached in the state (computed post-advance last step, or
        # from the bank at reset) — actions never change it mid-step because
        # the gate is evaluated before the action executes.
        ce0 = scoring.can_exit(
            state.perf_completed, state.perf_possible, state.min_performance)

        k_board, k_goals, k_reset = jax.random.split(key, 3)
        pallas_ok = (life_pallas.available(state.batch_size)
                     or (cfg.pallas_interpret
                         and state.batch_size % life_pallas.LANES == 0))
        fused = (spawn_board is None and spawn_goals is None
                 and cfg.use_pallas and pallas_ok
                 and not cfg.can_toggle_powers and not cfg.can_toggle_colors)
        effect_count = None
        reset_boards = None
        packed_view = None
        if fused:
            # Fast path: fused Pallas kernels do action + both CA advances
            # (in-core PRNG) + scoring + exit recolor + side-effect count —
            # and, when auto-resetting, the reset select of the three board
            # arrays — in single VMEM passes.  The XLA path below is the
            # reference semantics (CPU, parity mode with precomputed spawn
            # fields, toggle powers/colors) and the two are tested equal.
            fresh = None
            if cfg.auto_reset:
                if fresh_levels is not None and not cfg.sequential_levels:
                    idx, fresh = fresh_levels
                else:
                    idx = self._next_level_idx(
                        bank.num_levels, state.batch_size, state.reset_count,
                        k_reset)
                    fresh = self._fresh_state_fields(bank, idx)
            seed = jax.random.randint(
                k_board, (), 0, jnp.int32(2**31 - 1), dtype=jnp.int32)
            # On the auto-reset path the kernel also emits the packed
            # agent-centered view from its VMEM residency (the boards
            # never make a second HBM round-trip for observations).
            kernel_obs = cfg.auto_reset and cfg.compute_obs
            out = env_step_pallas.fused_step(
                state.board, state.goals, state.init_board, action,
                state.agent_row, state.agent_col, state.orientation,
                prev_over, ce0, state.baseline_score,
                state.spawn_prob, state.min_performance, seed,
                interpret=(life_pallas.interpret_params()
                           if cfg.pallas_interpret else False),
                static_goals=bank.static_goals,
                spawnless=bank.spawnless,
                simple_goals=bank.simple_goals,
                spawn_simple_goals=bank.spawn_simple_goals,
                perf_possible=state.perf_possible,
                episode_length=state.episode_length,
                fresh=fresh,
                time_limit=cfg.time_limit if cfg.auto_reset else 0,
                obs_view=cfg.view_shape if kernel_obs else None,
                exit_row=state.exit_row, exit_col=state.exit_col,
                exit_valid=state.exit_valid, exit_gcol=state.exit_gcol,
                remove_white_goals=cfg.remove_white_goals)
            (board, goals, agent_row, agent_col, orientation, exited,
             points, comp1, poss1, ce1, effect_count) = out[:11]
            if cfg.auto_reset:
                reset_boards = dict(
                    board=board, goals=goals,
                    init_board=out[11], fresh=fresh, idx=idx)
                if kernel_obs:
                    packed_view = out[12]
            exit_reward = exited.astype(jnp.float32) * jnp.float32(
                cfg.points_on_level_exit)
            act = agent_ops.ActionResult(
                board=None, agent_row=agent_row, agent_col=agent_col,
                orientation=orientation, exited=exited, reward=exit_reward)
        else:
            act = agent_ops.execute_action(
                state.board, state.agent_row, state.agent_col,
                state.orientation, action, ce0, prev_over,
                cfg.points_on_level_exit,
                cfg.can_toggle_powers, cfg.can_toggle_colors)
            if spawn_board is None:
                u = jax.random.uniform(k_board, state.board.shape, jnp.float32)
                spawn_board = u < state.spawn_prob[None, None, :]
            if spawn_goals is None:
                u = jax.random.uniform(k_goals, state.goals.shape, jnp.float32)
                spawn_goals = u < state.spawn_prob[None, None, :]
            board = life.advance_board(act.board, spawn_board)
            goals = state.goals if bank.static_goals else \
                life.advance_board(state.goals, spawn_goals)
            points = scoring.current_points(board, goals)
            comp1, poss1 = scoring.performance_ratio(
                board, goals, state.baseline_score)
            ce1 = scoring.can_exit(comp1, poss1, state.min_performance)
            board = _recolor_exits(board, state.init_board, ce1)
            effect_count = scoring.side_effect_count(
                board, state.init_board, goals)

        game_over = prev_over | act.exited
        reward = act.reward + (points - state.points_last).astype(jnp.float32)
        episode_length = state.episode_length + 1
        episode_reward = state.episode_reward + reward
        times_up = episode_length > cfg.time_limit
        done = times_up | game_over

        counted = ~prev_done
        mid = state.replace(
            board=board, goals=goals,
            agent_row=act.agent_row, agent_col=act.agent_col,
            orientation=act.orientation, game_over=game_over,
            points_last=points,
            perf_completed=comp1, perf_possible=poss1,
            episode_length=episode_length,
            episode_reward=episode_reward, episode_done=done,
            episodes_completed=state.episodes_completed
            + (done & counted).sum().astype(jnp.int32),
            num_steps=state.num_steps + counted.sum().astype(jnp.int32),
        )

        new_state = mid
        if cfg.auto_reset:
            if reset_boards is not None:
                # The kernel already reset the three board arrays in its
                # write pass; select only the small per-lane leaves here.
                fresh = reset_boards["fresh"]
                small = {k: v for k, v in fresh.items()
                         if k not in ("board", "goals", "init_board")}
                new_state = _select_reset(mid, small, done)
                new_state = new_state.replace(
                    init_board=reset_boards["init_board"])
            else:
                if fresh_levels is not None and not cfg.sequential_levels:
                    idx, fresh = fresh_levels
                else:
                    idx = self._next_level_idx(
                        bank.num_levels, state.batch_size, state.reset_count,
                        k_reset)
                    fresh = self._fresh_state_fields(bank, idx)
                new_state = _select_reset(mid, fresh, done)
            new_state = new_state.replace(
                reset_count=mid.reset_count + done.astype(jnp.int32),
                episodes_started=mid.episodes_started
                + done.sum().astype(jnp.int32),
            )

        if packed_view is not None:
            if cfg.output_channels is not None:
                obs = obs_ops.unpack_channels(
                    packed_view, cfg.output_channels)
            else:
                obs = jnp.transpose(packed_view, (2, 0, 1))
        elif cfg.compute_obs:
            obs = self.observe(new_state)
        else:
            obs = None
        ts = TimeStep(
            obs=obs,
            reward=reward, done=done, times_up=times_up,
            episode_length=mid.episode_length,
            episode_reward=mid.episode_reward,
            perf_completed=comp1, perf_possible=poss1,
            level_idx=mid.level_idx,
            side_effect_count=effect_count,
            state_before_reset=mid,
        )
        return new_state, ts


def _recolor_exits(board, init_board, open_):
    """Set exit cells to LEVEL_EXIT (+red when open).  Exit locations are
    taken from the initial board — exits are frozen and indestructible, so
    they never move during play (safelife_game.py:528-537)."""
    exit_mask = (init_board & C.EXIT) != 0
    cell = jnp.where(open_, jnp.uint16(C.LEVEL_EXIT | C.COLOR_R),
                     jnp.uint16(C.LEVEL_EXIT))
    return jnp.where(exit_mask, cell[None, None, :], board)


def _select_reset(mid: EnvState, fresh: dict, done):
    """Per-board select between mid-step state and freshly-reset fields."""
    updates = {}
    for name, new in fresh.items():
        old = getattr(mid, name)
        # All per-board leaves carry B on the trailing axis.
        shape = [1] * (old.ndim - 1) + [done.shape[0]]
        updates[name] = jnp.where(done.reshape(shape), new, old)
    return mid.replace(**updates)
