"""Episode recording: trajectory npz capture + gif/video rendering.

Capability parity with the reference's ``SafeLifeRecorder`` /
``RecordingSafeLifeWrapper`` (``env_wrappers.py:97-286``): capture the
board/goals/orientation at every step of an episode, save as npz, and
render to an animation.  In the batched world recording is a dedicated
host-driven rollout of a single env (the training path never leaves the
device), typically run at checkpoint time with the current policy.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np


def record_episode(env, bank, policy, key, level_idx=0, max_steps=1000):
    """Roll one episode with ``policy(obs, key) -> action`` and capture the
    trajectory.  Returns a dict with stacked boards/goals/orientations plus
    reward/length."""
    from ..env.wrappers import unwrap

    state = env.reset_to_levels(bank, jnp.asarray([level_idx], jnp.int32))
    obs = env.observe(unwrap(state)) if hasattr(env, "observe") else None
    boards, goals, orients = [], [], []
    total_reward = 0.0
    steps = 0
    for _ in range(max_steps):
        core = unwrap(state)
        boards.append(np.asarray(core.board[..., 0]))
        goals.append(np.asarray(core.goals[..., 0]))
        orients.append(int(core.orientation[0]))
        key, k_act, k_env = jax.random.split(key, 3)
        action = policy(obs, k_act)
        state, ts = env.step(state, bank, action, k_env)
        obs = ts.obs
        total_reward += float(ts.reward[0])
        steps += 1
        if bool(ts.done[0]):
            break
    return {
        "board": np.stack(boards),
        "goals": np.stack(goals),
        "orientation": np.array(orients),
        "reward": total_reward,
        "length": steps,
        "level_idx": level_idx,
    }


def save_trajectory(traj, base_path, render=True):
    """Save a recorded trajectory as npz (+ gif when render=True).
    Returns the list of files written."""
    os.makedirs(os.path.dirname(os.path.abspath(base_path)), exist_ok=True)
    npz_path = base_path + ".npz"
    np.savez_compressed(
        npz_path, board=traj["board"], goals=traj["goals"],
        orientation=traj["orientation"])
    written = [npz_path]
    if render:
        from ..render.graphics import render_file
        written.append(render_file(npz_path))
    return written
