"""Wrapper semantics tests: movement bonus, side-effect penalty, continuing,
schedules.  Movement bonus is checked against a literal simulation of the
reference's deque logic (env_wrappers.py:39-94)."""

import collections

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from safelife_tpu import cells as C
from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.env.wrappers import (
    ContinuingWrapper, MovementBonusWrapper, SideEffectPenaltyWrapper,
    linear_schedule, unwrap)
from safelife_tpu.levels import loader, synth


def make_env(**cfg):
    bank = synth.synth_bank(4, h=10, w=10)
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(9, 9), **cfg))
    return env, bank


def rollout(env, bank, batch, steps, seed=0, actions=None):
    key = jax.random.PRNGKey(seed)
    key, k = jax.random.split(key)
    state = env.reset_all(bank, batch, k)
    rewards, dones, states = [], [], []
    for t in range(steps):
        key, ka, ke = jax.random.split(key, 3)
        if actions is None:
            a = jax.random.randint(ka, (batch,), 0, 9)
        else:
            a = jnp.full((batch,), actions[t], jnp.int32)
        state, ts = env.step(state, bank, a, ke)
        rewards.append(np.asarray(ts.reward))
        dones.append(np.asarray(ts.done))
        states.append(ts)
    return state, np.stack(rewards), np.stack(dones), states


class RefMovementBonus:
    """Literal port of the reference deque logic for one env."""

    def __init__(self, loc, bonus=0.1, power=0.01, period=4):
        self.n = period
        self.bonus, self.power = bonus, power
        self.q = collections.deque([loc], period)

    def step(self, loc):
        p0 = loc
        if len(self.q) >= self.n:
            p1 = self.q[-self.n]
            dist = abs(p0[0] - p1[0]) + abs(p0[1] - p1[1])
        else:
            p1 = self.q[0]
            dist = abs(p0[0] - p1[0]) + abs(p0[1] - p1[1])
            dist += self.n - len(self.q)
        self.q.append(p0)
        return self.bonus * (dist / self.n) ** self.power


def test_movement_bonus_matches_reference_deque():
    env, bank = make_env(time_limit=100)
    wrapped = MovementBonusWrapper(env)
    batch = 4
    key = jax.random.PRNGKey(1)
    key, k = jax.random.split(key)
    state = wrapped.reset_all(bank, batch, k)

    core0 = unwrap(state)
    refs = [RefMovementBonus((int(core0.agent_row[b]), int(core0.agent_col[b])))
            for b in range(batch)]

    for t in range(20):
        key, ka, ke = jax.random.split(key, 3)
        a = jax.random.randint(ka, (batch,), 0, 9)
        # Baseline reward from the bare env on the same state.
        base_state, base_ts = env.step(unwrap(state), bank, a, ke)
        state, ts = wrapped.step(state, bank, a, ke)
        mid = ts.state_before_reset
        for b in range(batch):
            if np.asarray(ts.done)[b]:
                break  # refs don't model auto-reset; stop comparing
            expected = refs[b].step(
                (int(mid.agent_row[b]), int(mid.agent_col[b])))
            got = float(ts.reward[b]) - float(base_ts.reward[b])
            assert got == pytest.approx(expected, abs=1e-5), (t, b)
        else:
            continue
        break


def test_side_effect_penalty_counts_disturbance():
    env, bank = make_env(time_limit=100)
    wrapped = SideEffectPenaltyWrapper(env, penalty_coef=1.0,
                                       min_performance=-1.0)
    batch = 2
    key = jax.random.PRNGKey(0)
    state = wrapped.reset_all(bank, batch, key)
    core = unwrap(state)
    # Destroying a life cell the CA wouldn't otherwise change produces a
    # penalty of exactly penalty_coef on that step... but random life often
    # dies anyway.  Instead check: a NULL action on a static board gives no
    # penalty, and the penalty equals the (reward-free) cell-diff delta.
    a = jnp.zeros((batch,), jnp.int32)
    k = jax.random.PRNGKey(2)
    base_state, base_ts = env.step(core, bank, a, k)
    state2, ts = wrapped.step(state, bank, a, k)
    mid = ts.state_before_reset
    effect = wrapped.side_effect_count(mid.board, mid.init_board, mid.goals)
    np.testing.assert_allclose(
        np.asarray(ts.reward),
        np.asarray(base_ts.reward) - np.asarray(effect, np.float32))


def test_side_effect_penalty_sets_min_performance():
    env, bank = make_env()
    wrapped = SideEffectPenaltyWrapper(
        env, penalty_coef=0.0,
        min_performance=linear_schedule([0, 100], [0.0, 0.5]))
    state = wrapped.reset_all(bank, 2, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(unwrap(state).min_performance), 0.0)


def test_continuing_done_only_on_times_up():
    env, bank = make_env(time_limit=5)
    wrapped = ContinuingWrapper(env)
    _, rewards, dones, _ = rollout(wrapped, bank, 8, 14, seed=3)
    # dones exactly where episode length exceeds the time limit
    assert dones[:5].sum() == 0
    assert dones[5].all()  # all start in lockstep -> all time out together
    assert dones[6:11].sum() == 0
    assert dones[11].all()


def test_linear_schedule_interp():
    s = linear_schedule([0, 10, 20], [1.0, 3.0, 3.0])
    assert float(s(jnp.int32(0))) == 1.0
    assert float(s(jnp.int32(5))) == 2.0
    assert float(s(jnp.int32(15))) == 3.0
    assert float(s(jnp.int32(100))) == 3.0


def test_wrapper_stack_composes_and_jits():
    env, bank = make_env(time_limit=50)
    stack = ContinuingWrapper(SideEffectPenaltyWrapper(
        MovementBonusWrapper(env), penalty_coef=0.1))
    batch = 4
    key = jax.random.PRNGKey(0)
    state = stack.reset_all(bank, batch, key)

    @jax.jit
    def run(state, key):
        def body(carry, _):
            state, key = carry
            key, ka, ke = jax.random.split(key, 3)
            a = jax.random.randint(ka, (batch,), 0, 9)
            state, ts = stack.step(state, bank, a, ke)
            return (state, key), ts.reward
        return jax.lax.scan(body, (state, key), length=60)

    (state, _), rewards = run(state, key)
    assert np.isfinite(np.asarray(rewards)).all()
    assert int(unwrap(state).num_steps) == 4 * 60
    obs = stack.observe(state)
    assert obs.shape == (4, 9, 9, 15)
