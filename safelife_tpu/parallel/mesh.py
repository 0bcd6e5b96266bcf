"""Device mesh + sharding rules for lockstep SafeLife at scale.

The reference has no distributed backend at all — "distribution" is gcloud
scripts launching independent single-node jobs (reference: ``gcloud/
start-remote-job:40-80``; see SURVEY.md §2.3).  Here the communication layer
is a first-class component: a named :class:`jax.sharding.Mesh` whose ``data``
axis carries the environment batch, with XLA collectives (``psum`` gradient
all-reduce inside pjit) riding ICI.  The model is a tiny CNN, so the
``model`` axis exists but is size 1 by default (reserved — TP/PP are not
needed per SURVEY.md §2.3; enabling them is a mesh reshape, not a rewrite).

Sharding layout (batch-trailing boards, see ops/life.py):

====================  =========================  ========================
array                 shape                      PartitionSpec
====================  =========================  ========================
boards/goals          (H, W, B)                  (None, None, 'data')
per-env scalars       (B,)                       ('data',)
exit tables           (K, B)                     (None, 'data')
global counters       ()                         ()   [replicated]
observations          (B, vh, vw, C)             ('data', ...)
trajectories          (T, B, ...)                (None, 'data', ...)
level bank            any                        ()   [replicated per host]
network params        any                        ()   [replicated]
====================  =========================  ========================
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data=None, n_model=1, devices=None):
    """Build a (data, model) mesh over the local devices.

    ``n_data=None`` uses every available device on the data axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    devices = devices[: n_data * n_model]
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_trailing_spec(x):
    """PartitionSpec sharding the *trailing* axis over 'data' (env state)."""
    if getattr(x, "ndim", 0) == 0:
        return P()
    return P(*([None] * (x.ndim - 1)), DATA_AXIS)


def batch_leading_spec(x):
    """PartitionSpec sharding the *leading* axis over 'data' (observations,
    actions, rewards)."""
    if getattr(x, "ndim", 0) == 0:
        return P()
    return P(DATA_AXIS, *([None] * (x.ndim - 1)))


def replicated_spec(_x=None):
    return P()


def env_state_shardings(mesh, state):
    """NamedShardings for an EnvState pytree (batch-trailing leaves,
    replicated global counters)."""
    return jax.tree.map(
        lambda x: NamedSharding(mesh, batch_trailing_spec(x)), state)


def bank_shardings(mesh, bank):
    """Level banks are replicated: resets gather random levels, so sharding
    the bank would turn every reset into an all-to-all.  Banks are small
    (100 levels x 26x26 u16 ~ 135 KB)."""
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), bank)


def shard_env(mesh, state, bank=None):
    """Place an env state (and optionally a bank) onto the mesh."""
    state = jax.device_put(state, env_state_shardings(mesh, state))
    if bank is None:
        return state
    bank = jax.device_put(bank, bank_shardings(mesh, bank))
    return state, bank


def shard_batch_leading(mesh, tree):
    """Place obs/action/reward-like pytrees (batch leading) onto the mesh."""
    return jax.device_put(
        tree,
        jax.tree.map(
            lambda x: NamedSharding(mesh, batch_leading_spec(x)), tree))


def replicate(mesh, tree):
    """Replicate params / optimizer state / scalars across the mesh."""
    return jax.device_put(
        tree, jax.tree.map(lambda _: NamedSharding(mesh, P()), tree))
