"""Quantify the `sample_fresh_levels` reset-aliasing bias (VERDICT r2 #8).

`BatchedSafeLifeEnv.step` with per-rollout pre-gathered fresh levels
replays the same level if an env resets twice within one rollout.  The
duplicate-replay ("stale reset") rate is a function of episode length L
vs rollout length T: an env can only reset twice in a window when its
episode ends within T steps of a reset, so the rate is ~0 for L >= T and
grows as T/L beyond that.  These tests measure it:

* at training-realistic ratios (reference time_limit=1000, rollout T=20;
  trained episode lengths in RESULTS.md are 100-1000) the stale fraction
  is negligible (< 2%),
* at pathological ratios (L < T) it is large — if a task ever runs
  episodes shorter than the rollout, pass ``fresh_levels=None`` for exact
  per-step resampling (now cheap: resets gather via the one-hot MXU
  contraction, LevelBank.take_onehot).
"""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.levels import synth

B = 64
T = 20  # rollout length == reference steps_per_env


def stale_reset_rate(time_limit, windows=30):
    bank = synth.synth_bank(8, h=13, w=13)
    env = BatchedSafeLifeEnv(EnvConfig(
        compute_obs=False, time_limit=time_limit))
    key = jax.random.PRNGKey(0)
    state = env.reset_all(bank, B, key)

    @jax.jit
    def run(state, key):
        def window(carry, _):
            state, key = carry
            key, kf = jax.random.split(key)
            fresh = env.sample_fresh_levels(bank, B, kf)

            def body(carry, _):
                state, key = carry
                key, ka, ke = jax.random.split(key, 3)
                action = jax.random.randint(ka, (B,), 0, 9)
                state, ts = env.step(state, bank, action, ke,
                                     fresh_levels=fresh)
                return (state, key), ts.done
            (state, key), dones = jax.lax.scan(body, (state, key), length=T)
            resets = dones.sum(axis=0)  # (B,) resets per lane this window
            stale = jnp.maximum(resets - 1, 0).sum()
            return (state, key), (resets.sum(), stale)
        (state, key), (resets, stale) = jax.lax.scan(
            window, (state, key), length=windows)
        return resets.sum(), stale.sum()

    resets, stale = jax.device_get(run(state, key))
    return int(resets), int(stale)


@pytest.mark.heavy
def test_stale_rate_negligible_at_training_ratios():
    # Shortest trained-policy episodes in RESULTS.md are ~100 steps; even
    # L = 5*T keeps duplicate replays under 2% of resets.
    resets, stale = stale_reset_rate(time_limit=5 * T)
    assert resets > 100
    rate = stale / resets
    assert rate < 0.02, f"stale reset rate {rate:.3f} at L=5T"


def test_stale_rate_pathological_short_episodes():
    # L < T: multiple resets per window — the documented failure mode.
    resets, stale = stale_reset_rate(time_limit=T // 2)
    rate = stale / resets
    assert rate > 0.2, (
        f"expected heavy aliasing at L=T/2, measured {rate:.3f} — "
        "if this dropped, the default could switch to per-step sampling")


def test_per_step_resampling_has_no_aliasing():
    """fresh_levels=None draws a new random level at every reset."""
    bank = synth.synth_bank(8, h=13, w=13)
    env = BatchedSafeLifeEnv(EnvConfig(compute_obs=False, time_limit=6))
    key = jax.random.PRNGKey(1)
    state = env.reset_all(bank, B, key)
    idxs = []
    for _ in range(40):
        key, ka, ke = jax.random.split(key, 3)
        action = jax.random.randint(ka, (B,), 0, 9)
        state, ts = env.step(state, bank, action, ke)
        idxs.append(np.where(np.asarray(ts.done),
                             np.asarray(state.level_idx), -1))
    # Consecutive resets of lane 0 should not always be the same level.
    lane0 = [int(v[0]) for v in idxs if v[0] >= 0]
    assert len(lane0) >= 4
    assert len(set(lane0)) > 1
