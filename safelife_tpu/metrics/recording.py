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
    reward/length.

    The whole rollout runs as ONE jitted ``lax.scan`` with a single
    device->host transfer at the end — a per-step host loop costs
    ~1000 x (dispatch + transfer) through the TPU tunnel (minutes per
    checkpoint video).  Frames after the first episode end are dropped
    host-side.  A policy carrying ``.raw``/``.params`` (Trainer.policy_fn)
    gets its params traced so repeated recordings reuse the compile.
    """
    from ..env.wrappers import unwrap

    raw_policy = getattr(policy, "raw", None)
    params = getattr(policy, "params", None)
    recurrent = bool(getattr(policy, "recurrent", False))
    rnn0 = policy.init_carry(1) if recurrent else None
    state0 = env.reset_to_levels(bank, jnp.asarray([level_idx], jnp.int32))
    obs0 = env.observe(unwrap(state0))

    @jax.jit
    def run(params, state, obs, key):
        def body(carry, _):
            state, obs, key, rnn = carry
            core = unwrap(state)
            key, k_act, k_env = jax.random.split(key, 3)
            if recurrent:
                action, rnn = raw_policy(params, obs, rnn, k_act)
            elif raw_policy is not None:
                action = raw_policy(params, obs, k_act)
            else:
                action = policy(obs, k_act)
            new_state, ts = env.step(state, bank, action, k_env)
            frame = (core.board[..., 0], core.goals[..., 0],
                     core.orientation[0], ts.reward[0], ts.done[0])
            return (new_state, ts.obs, key, rnn), frame
        _, frames = jax.lax.scan(body, (state, obs, key, rnn0),
                                 length=max_steps)
        return frames

    boards, goals, orients, rewards, dones = jax.device_get(
        run(params, state0, obs0, key))
    ends = np.flatnonzero(dones)
    steps = int(ends[0]) + 1 if len(ends) else max_steps
    return {
        "board": boards[:steps],
        "goals": goals[:steps],
        "orientation": orients[:steps],
        "reward": float(rewards[:steps].sum()),
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
