"""Environment wrappers as pure functions over batched state.

Capability parity with ``safelife/env_wrappers.py``, redesigned so every
wrapper is jit-compatible: wrapper state is a pytree wrapping the inner
state, ``step`` stays ``(state, bank, action, key) -> (state, TimeStep)``,
and per-board resets (auto-reset inside the core env) are handled with
masked selects on the ``done`` flags.

Schedulable parameters: any numeric parameter may instead be a callable of
the global step count (a traced int32 scalar) — the reference's
``scheduled()`` semantics (``env_wrappers.py:29-36``) — e.g. built with
:func:`linear_schedule`.

The reference's ``ContinuingEnv`` is native here: the core env auto-resets;
:class:`ContinuingWrapper` merely reports ``done`` only on ``times_up`` so
that value bootstrapping continues across episode boundaries
(``env_wrappers.py:289-303``).
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import cells as C

_U16 = jnp.uint16


def scheduled(val, num_steps):
    """Evaluate a possibly-scheduled parameter at the global step count."""
    return val(num_steps) if callable(val) else val


def linear_schedule(t, y):
    """Piecewise-linear schedule of the global step count
    (reference: ``training/safelife_ppo.py:16-17``)."""
    t = np.asarray(t, np.float32)
    y = np.asarray(y, np.float32)

    def sched(step):
        return jnp.interp(jnp.asarray(step, jnp.float32), t, y)
    # Hashable/eq by values so jit caches across instances.
    sched._schedule_key = (tuple(t.tolist()), tuple(y.tolist()))
    return sched


def _param_key(v):
    if callable(v):
        return getattr(v, "_schedule_key", v)
    return v


class Wrapper:
    """Base: delegates everything to the inner env; hashable by params so
    jitted methods cache across instances."""

    def __init__(self, env):
        self.env = env

    @property
    def config(self):
        return self.env.config

    def _key(self):
        return (type(self).__name__, self.env)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return type(other) is type(self) and other._key() == self._key()

    def observe(self, state):
        return self.env.observe(state.inner
                                if isinstance(state, WrapperState) else state)

    def reset_all(self, bank, batch_size, key):
        return self.env.reset_all(bank, batch_size, key)

    def reset_to_levels(self, bank, idx):
        return self.env.reset_to_levels(bank, idx)

    def step(self, state, bank, action, key, **kw):
        return self.env.step(state, bank, action, key, **kw)


def unwrap(state):
    """Peel all wrapper layers -> the core EnvState."""
    while isinstance(state, WrapperState):
        state = state.inner
    return state


def replace_core(state, new_core):
    """Functionally replace the core EnvState under any wrapper nesting."""
    if isinstance(state, WrapperState):
        return state.replace(inner=replace_core(state.inner, new_core))
    return new_core


class WrapperState(struct.PyTreeNode):
    inner: Any
    extra: Any

    def __getattr__(self, name):
        # Delegate state attribute access (num_steps, batch_size, ...) so
        # wrappers compose transparently.
        return getattr(self.inner, name)

    @property
    def batch_size(self):
        return self.inner.batch_size


class ContinuingWrapper(Wrapper):
    """done only on times_up; episodes otherwise roll straight through
    (the core env has already auto-reset).  Reference
    ``env_wrappers.py:289-303``."""

    def step(self, state, bank, action, key, **kw):
        state, ts = self.env.step(state, bank, action, key, **kw)
        return state, ts.replace(done=ts.times_up)


class MovementBonusWrapper(Wrapper):
    """Reward bonus for agent movement (``env_wrappers.py:39-94``).

    speed = L1 distance between the agent's position now and ``period``
    steps ago, divided by ``period``; at episode start the agent is treated
    as if it had been moving continuously before entering.
    bonus = movement_bonus * speed ** movement_bonus_power.
    """

    def __init__(self, env, movement_bonus=0.1, movement_bonus_power=0.01,
                 movement_bonus_period=4):
        super().__init__(env)
        self.movement_bonus = movement_bonus
        self.movement_bonus_power = movement_bonus_power
        self.period = movement_bonus_period

    def _key(self):
        return (type(self).__name__, self.env,
                _param_key(self.movement_bonus),
                _param_key(self.movement_bonus_power), self.period)

    def _fresh(self, inner_state):
        inner_state = unwrap(inner_state)
        n = self.period
        row = jnp.broadcast_to(inner_state.agent_row, (n,) + inner_state.agent_row.shape)
        col = jnp.broadcast_to(inner_state.agent_col, (n,) + inner_state.agent_col.shape)
        return dict(buf_row=row, buf_col=col,
                    count=jnp.ones(inner_state.batch_size, jnp.int32),
                    t=jnp.int32(0))

    def reset_all(self, bank, batch_size, key):
        inner = self.env.reset_all(bank, batch_size, key)
        return WrapperState(inner=inner, extra=self._fresh(inner))

    def reset_to_levels(self, bank, idx):
        inner = self.env.reset_to_levels(bank, idx)
        return WrapperState(inner=inner, extra=self._fresh(inner))

    def step(self, state, bank, action, key, **kw):
        n = self.period
        ex = state.extra
        inner, ts = self.env.step(state.inner, bank, action, key, **kw)
        mid = ts.state_before_reset
        p0r, p0c = mid.agent_row, mid.agent_col

        slot = ex["t"] % n
        p1r = jax.lax.dynamic_index_in_dim(ex["buf_row"], slot, keepdims=False)
        p1c = jax.lax.dynamic_index_in_dim(ex["buf_col"], slot, keepdims=False)
        dist = (jnp.abs(p0r - p1r) + jnp.abs(p0c - p1c)).astype(jnp.float32)
        dist = dist + jnp.maximum(0, n - ex["count"]).astype(jnp.float32)
        speed = dist / n
        num_steps = mid.num_steps
        bonus = (scheduled(self.movement_bonus, num_steps)
                 * speed ** scheduled(self.movement_bonus_power, num_steps))
        ts = ts.replace(reward=ts.reward + bonus)

        buf_row = jax.lax.dynamic_update_index_in_dim(
            ex["buf_row"], p0r, slot, axis=0)
        buf_col = jax.lax.dynamic_update_index_in_dim(
            ex["buf_col"], p0c, slot, axis=0)
        count = ex["count"] + 1
        # Where an episode ended, refill the buffer with the fresh (post-
        # reset) agent position — the reference reseeds its deque on reset.
        inner_env = unwrap(inner)
        done = ts.done
        buf_row = jnp.where(done[None, :], inner_env.agent_row[None, :], buf_row)
        buf_col = jnp.where(done[None, :], inner_env.agent_col[None, :], buf_col)
        count = jnp.where(done, 1, count)
        new_extra = dict(buf_row=buf_row, buf_col=buf_col, count=count,
                         t=ex["t"] + 1)
        return WrapperState(inner=inner, extra=new_extra), ts


class SideEffectPenaltyWrapper(Wrapper):
    """Penalize departures from the starting board
    (reference ``SimpleSideEffectPenalty``, ``env_wrappers.py:306-346``).

    Each step, count cells differing from the initial board — ignoring the
    agent-ish bits everywhere, exit cells, removed red life, and live cells
    on blue goals — and subtract ``penalty_coef * delta`` from the reward.
    Also overrides each fresh episode's ``min_performance`` with the
    (schedulable) ``min_performance`` parameter.
    """

    def __init__(self, env, penalty_coef=0.0, min_performance=0.01):
        super().__init__(env)
        self.penalty_coef = penalty_coef
        self.min_performance = min_performance

    def _key(self):
        return (type(self).__name__, self.env,
                _param_key(self.penalty_coef),
                _param_key(self.min_performance))

    def _override_min_perf(self, inner_state, done=None):
        mp = scheduled(self.min_performance, inner_state.num_steps)
        mp = jnp.broadcast_to(jnp.asarray(mp, jnp.float32),
                              (inner_state.batch_size,))
        if done is not None:
            mp = jnp.where(done, mp, inner_state.min_performance)
        return inner_state.replace(min_performance=mp)

    def _wrap_fresh(self, inner):
        st = self._override_min_perf(unwrap(inner))
        inner = replace_core(inner, st)
        return WrapperState(
            inner=inner,
            extra=dict(last_side_effect=jnp.zeros(st.batch_size, jnp.int32)))

    def reset_all(self, bank, batch_size, key):
        return self._wrap_fresh(self.env.reset_all(bank, batch_size, key))

    def reset_to_levels(self, bank, idx):
        return self._wrap_fresh(self.env.reset_to_levels(bank, idx))

    def side_effect_count(self, board, init_board, goals):
        """# cells counted as side effects (B,) int32."""
        from ..ops import scoring
        return scoring.side_effect_count(board, init_board, goals)

    def step(self, state, bank, action, key, **kw):
        inner, ts = self.env.step(state.inner, bank, action, key, **kw)
        mid = ts.state_before_reset
        if ts.side_effect_count is not None:
            effect = ts.side_effect_count  # computed in the fused kernel
        else:
            effect = self.side_effect_count(
                mid.board, mid.init_board, mid.goals)
        delta = (effect - state.extra["last_side_effect"]).astype(jnp.float32)
        coef = scheduled(self.penalty_coef, mid.num_steps)
        ts = ts.replace(reward=ts.reward - delta * coef)
        last = jnp.where(ts.done, 0, effect)
        # Fresh episodes get the scheduled min_performance.
        st = self._override_min_perf(unwrap(inner), done=ts.done)
        inner = replace_core(inner, st)
        return (WrapperState(inner=inner, extra=dict(last_side_effect=last)),
                ts)
