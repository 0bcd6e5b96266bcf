"""Policy/value network for SafeLife PPO, in flax.

Architecture matches the reference's TF1 CNN
(``training/safelife_ppo.py:141-202``): one-hot 15-channel input ->
conv 32x5x5/s2 -> conv 64x3x3/s2 -> conv 64x3x3/s1 (VALID padding, relu,
orthogonal init scaled sqrt(2)) -> dense 512 (or LSTM 512) -> policy logits
(ortho scale 0.01) + one value head per discount factor (ortho scale 1.0).

TPU notes: convs run on the MXU in bfloat16 by default (params and outputs
stay f32; see ``compute_dtype``), and the observation arrives as uint8
binary channels from :mod:`safelife_tpu.ops.obs`, cast here.
"""

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

ortho = nn.initializers.orthogonal


class SafeLifeCNN(nn.Module):
    """Feed-forward trunk + policy/value heads.

    Call with obs of shape (..., H, W, C) uint8/float; leading dims are
    treated as batch.  Returns (logits (..., num_actions),
    values (..., n_gamma)).
    """
    num_actions: int = 9
    n_gamma: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs):
        batch_shape = obs.shape[:-3]
        x = obs.reshape((-1,) + obs.shape[-3:]).astype(self.compute_dtype)
        for features, kernel, stride in ((32, 5, 2), (64, 3, 2), (64, 3, 1)):
            x = nn.Conv(
                features, (kernel, kernel), strides=(stride, stride),
                padding="VALID", kernel_init=ortho(jnp.sqrt(2)),
                dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
        if 0 in x.shape[1:3]:
            raise ValueError(
                f"view {obs.shape[-3:-1]} too small for the VALID-padded "
                f"conv trunk (needs >= {min_view_for_net()}); got empty "
                f"feature map {x.shape}")
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(512, kernel_init=ortho(jnp.sqrt(2)),
                     dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        logits = nn.Dense(self.num_actions, kernel_init=ortho(0.01),
                          dtype=jnp.float32, param_dtype=jnp.float32)(x)
        values = nn.Dense(self.n_gamma, kernel_init=ortho(1.0),
                          dtype=jnp.float32, param_dtype=jnp.float32)(x)
        return (logits.reshape(batch_shape + (self.num_actions,)),
                values.reshape(batch_shape + (self.n_gamma,)))


class SafeLifeLSTMNet(nn.Module):
    """CNN trunk + LSTM(512) core, the reference's optional recurrent path
    (safelife_ppo.py:168-189).  Processes one step at a time; the caller
    carries the LSTM state through the rollout and resets it with
    ``done`` masks (state * ~done)."""
    num_actions: int = 9
    n_gamma: int = 1
    compute_dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, obs, carry):
        x = obs.reshape((-1,) + obs.shape[-3:]).astype(self.compute_dtype)
        for features, kernel, stride in ((32, 5, 2), (64, 3, 2), (64, 3, 1)):
            x = nn.Conv(
                features, (kernel, kernel), strides=(stride, stride),
                padding="VALID", kernel_init=ortho(jnp.sqrt(2)),
                dtype=self.compute_dtype, param_dtype=jnp.float32)(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        cell = nn.OptimizedLSTMCell(512)
        carry, y = cell(carry, x)
        logits = nn.Dense(self.num_actions, kernel_init=ortho(0.01))(y)
        values = nn.Dense(self.n_gamma, kernel_init=ortho(1.0))(y)
        return carry, (logits, values)

    @staticmethod
    def initial_carry(batch_size):
        z = jnp.zeros((batch_size, 512), jnp.float32)
        return (z, z)


def min_view_for_net() -> Tuple[int, int]:
    """Smallest view the VALID-padded trunk accepts (the reference trains at
    33x33; its 15x15 default view is for humans/render and would produce an
    empty feature map here too).

    Chain: v -> (v-5)//2+1 -> (.-3)//2+1 -> (.-3)+1, which needs v >= 17
    to keep the last feature map non-empty."""
    return (17, 17)
