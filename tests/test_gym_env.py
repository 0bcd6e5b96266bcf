"""Gymnasium adapter tests."""

import numpy as np

from safelife_tpu.gym_env import SafeLifeGymEnv, register
from safelife_tpu.levels.iterator import safelife_loader


def test_gym_env_episode():
    env = SafeLifeGymEnv(
        safelife_loader("benchmarks/v1.0/append-still.npz", repeat=True),
        view_shape=(15, 15), time_limit=50)
    obs, info = env.reset(seed=0)
    assert obs.shape == (15, 15, 15) and obs.dtype == np.uint8
    total = 0.0
    rng = np.random.RandomState(0)
    for _ in range(60):
        obs, reward, terminated, truncated, info = env.step(rng.randint(9))
        total += reward
        if terminated or truncated:
            break
    assert terminated or truncated
    assert np.isfinite(total)
    assert isinstance(env.render(), str)
    img = SafeLifeGymEnv.render
    env.render_mode = "rgb_array"
    assert env.render().ndim == 3


def test_gym_registration():
    import gymnasium
    register(tasks=("append-still-easy",))
    env = gymnasium.make("safelife-append-still-easy-v1")
    obs, info = env.reset(seed=1)
    assert obs.shape == (15, 15, 15)
    obs, reward, term, trunc, info = env.step(1)
    assert obs.shape == (15, 15, 15)
