"""On-device PPO: batched rollout, multi-discount GAE, clipped update.

Functional redesign of the reference trainer (``training/ppo.py:64-559``):
where the reference interleaves a TF1 ``session.run`` policy batch with 16
sequential Python env steps, here the rollout is a ``lax.scan`` over the
batched env, GAE is a reverse scan, and the whole
rollout -> advantages -> epochs x minibatches -> Adam pipeline is ONE jitted
``train_step`` that never leaves the device.

Reference-faithful loss details (all optional, defaults mirror the
reference):

* Policy loss via ``|A| * rect(sign(A) * (1 - pi/pi_old), eps)`` with a
  relu/elu rectifier (``ppo.py:242-257``) — gradient-equivalent to the
  standard PPO clipped surrogate, with the elu giving a smooth clip.
* Optional eps rescaling by ``(1 + min_eps_rescale - pi_old)``.
* Pseudo-entropy bookkeeping (``ppo.py:258-275``): the reference
  stop-gradients the pseudo-entropy, so its "entropy bonus" contributes no
  policy gradient; its real effect is a *smoothed pseudo-entropy* tracker
  variable (updated by a quadratic tracking loss) that rescales the value
  loss.  We reproduce that, and offer ``entropy_grad=True`` for a standard
  differentiable entropy bonus.
* Clipped value loss scaled by the smoothed pseudo-entropy
  (``ppo.py:276-296``).
* Multi-gamma heads: discounts, returns, advantages and value losses all
  carry a trailing ``n_gamma`` axis with per-gamma weights.
"""

import dataclasses
import os
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    gamma: Tuple[float, ...] = (0.97,)
    lmda: float = 0.9
    policy_discount_weights: Tuple[float, ...] = (1.0,)
    value_discount_weights: Tuple[float, ...] = (1.0,)

    learning_rate: float = 3e-4
    # Linear LR decay to learning_rate * lr_final_frac over this many
    # OPTIMIZER updates (epochs x minibatches per train_batch); 0 = constant
    # LR (the reference's setting — its curve sags late in the 10M-step
    # runs, which the decay fixes).
    lr_decay_steps: int = 0
    lr_final_frac: float = 0.1
    entropy_reg: float = 5e-2
    entropy_clip: float = 1.0
    entropy_grad: bool = False   # reference stop-gradients the bonus
    vf_coef: float = 1.0
    max_gradient_norm: float = 1.0
    eps_clip: float = 0.1
    rescale_policy_eps: bool = False
    min_eps_rescale: float = 1e-3
    reward_clip: float = 30.0
    value_grad_rescaling: str = "smooth"  # False|'smooth'|'per_batch'|'per_state'
    policy_rectifier: str = "elu"  # 'relu' | 'elu'

    steps_per_env: int = 20
    num_minibatches: int = 4
    epochs_per_batch: int = 3
    adam_epsilon: float = 1e-6

    # Number of data-parallel shards of the env batch (the mesh's 'data'
    # axis size).  Minibatch shuffling is done independently within each
    # shard so the epoch loop never moves trajectory data across devices —
    # only gradients all-reduce.  1 = single-device (a global shuffle).
    data_shards: int = 1

    @property
    def n_gamma(self):
        return len(self.gamma)


class TrainState(struct.PyTreeNode):
    params: Any              # {'net': ..., 'spe': smoothed pseudo-entropy}
    opt_state: Any
    update_step: Any         # () int32 — number of train_batch updates


class Trajectory(struct.PyTreeNode):
    obs: Any        # (T, B, vh, vw, C) uint8
    action: Any     # (T, B) int32
    old_pi: Any     # (T, B) float32 — pi_old(action)
    reward: Any     # (T, B) float32
    done: Any       # (T, B) bool
    value: Any      # (T+1, B, n_gamma) float32


def make_optimizer(cfg: PPOConfig, lr=None):
    if lr is None:
        lr = cfg.learning_rate
        if cfg.lr_decay_steps > 0:
            lr = optax.linear_schedule(
                cfg.learning_rate, cfg.learning_rate * cfg.lr_final_frac,
                cfg.lr_decay_steps)
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_gradient_norm)
        if cfg.max_gradient_norm > 0 else optax.identity(),
        optax.adam(lr, eps=cfg.adam_epsilon),
    )


def init_train_state(cfg: PPOConfig, net, obs_shape, key, tx=None,
                     carry=None):
    dummy = jnp.zeros((1,) + tuple(obs_shape), jnp.uint8)
    if carry is not None:  # recurrent net: init through (obs, carry)
        dummy_carry = jax.tree.map(lambda x: x[:1], carry)
        net_params = net.init(key, dummy, dummy_carry)
    else:
        net_params = net.init(key, dummy)
    params = {"net": net_params, "spe": jnp.float32(1.0)}
    tx = tx or make_optimizer(cfg)
    return TrainState(
        params=params, opt_state=tx.init(params),
        update_step=jnp.int32(0))


# ---------------------------------------------------------------------------
# Rollout
# ---------------------------------------------------------------------------

def rollout(cfg: PPOConfig, net, env, bank, params, env_state, obs, key):
    """Collect ``cfg.steps_per_env`` lockstep steps from the batched env.

    ``env`` may be a :class:`BatchedSafeLifeEnv` or any wrapper exposing the
    same ``step(state, bank, action, key) -> (state, TimeStep)`` API (reward
    wrappers live in safelife_tpu.env.wrappers).
    Returns (env_state, obs, Trajectory).
    """
    key, k_fresh = jax.random.split(key)
    fresh = None
    if getattr(env.config, "auto_reset", False):
        # Pre-gather this rollout's reset levels once (see
        # BatchedSafeLifeEnv.sample_fresh_levels).
        batch = jax.tree.leaves(env_state)[0].shape[-1]
        core_env = env
        while not hasattr(core_env, "sample_fresh_levels"):
            core_env = core_env.env  # descend the wrapper chain
        fresh = core_env.sample_fresh_levels(bank, batch, k_fresh)

    def policy_step(carry, _):
        env_state, obs, key = carry
        key, k_act, k_env = jax.random.split(key, 3)
        logits, value = net.apply(params["net"], obs)
        action = jax.random.categorical(k_act, logits)
        probs = jax.nn.softmax(logits)
        old_pi = jnp.take_along_axis(probs, action[:, None], axis=1)[:, 0]
        new_env_state, ts = env.step(env_state, bank, action, k_env,
                                     fresh_levels=fresh)
        reward = ts.reward
        stats = dict(done=ts.done, times_up=ts.times_up,
                     episode_length=ts.episode_length,
                     episode_reward=ts.episode_reward,
                     perf_completed=ts.perf_completed,
                     perf_possible=ts.perf_possible,
                     level_idx=ts.level_idx,
                     # Pre-reset side-effect cell count, free from the env
                     # kernels; logged per finished episode like the
                     # reference's training records (env_wrappers.py:195-231).
                     side_effects=ts.side_effect_count)
        out = (obs, action.astype(jnp.int32), old_pi, reward, ts.done, value,
               stats)
        return (new_env_state, ts.obs, key), out

    (env_state, obs, _), \
        (obs_seq, action, old_pi, reward, done, value, epstats) = \
        jax.lax.scan(policy_step, (env_state, obs, key), length=cfg.steps_per_env)
    _, final_value = net.apply(params["net"], obs)
    value = jnp.concatenate([value, final_value[None]], axis=0)
    traj = Trajectory(obs=obs_seq, action=action, old_pi=old_pi,
                      reward=reward, done=done, value=value)
    return env_state, obs, traj, epstats


# ---------------------------------------------------------------------------
# Advantages (multi-gamma GAE) — reference ppo.py:466-508
# ---------------------------------------------------------------------------

def compute_gae(cfg: PPOConfig, reward, done, value):
    """reward/done: (T, B); value: (T+1, B, n_gamma).
    Returns (returns, advantages): (T, B, n_gamma)."""
    gamma = jnp.asarray(cfg.gamma, jnp.float32)          # (n_gamma,)
    lam_gamma = cfg.lmda * gamma
    if cfg.reward_clip > 0:
        reward = jnp.clip(reward, -cfg.reward_clip, cfg.reward_clip)
    r = reward[..., None]                                # (T, B, 1)
    mask = (~done)[..., None].astype(jnp.float32)        # (T, B, 1)
    delta = r + gamma * mask * value[1:] - value[:-1]

    def backward(carry, x):
        next_ret, next_adv = carry
        r_t, m_t, d_t, v_next = x
        ret = r_t + gamma * m_t * next_ret
        adv = d_t + lam_gamma * m_t * next_adv
        return (ret, adv), (ret, adv)

    init = (value[-1], jnp.zeros_like(value[-1]))
    _, (returns, adv) = jax.lax.scan(
        backward, init, (r, mask, delta, value[1:]), reverse=True)
    return returns, adv


# ---------------------------------------------------------------------------
# Losses — reference ppo.py:242-305
# ---------------------------------------------------------------------------

def _unroll_updates():
    """Unroll the epoch/minibatch scans on the CPU backend.

    XLA:CPU lowers *backward* convolutions inside scan/while bodies to a
    naive thunk: the identical conv gradient measured 1.06s direct vs
    116.7s inside ``lax.scan`` (B=1280, 33x33x15 obs, this host).  Fully
    unrolling the update loops lets the while-loop simplifier hoist the
    convs back onto the fast path — 43x faster CPU training batches
    (167s -> 3.9s at 64 envs).  On TPU the rolled scan compiles leaner
    and runs identically, so keep it there.

    ``SAFELIFE_UNROLL_UPDATES=0/1`` overrides — the HLO scaling analysis
    traces on a CPU mesh as a proxy for the TPU lowering and must see
    the rolled form (an unrolled graph repeats the gradient all-reduce
    instruction per minibatch, inflating the static collective count).
    """
    env = os.environ.get("SAFELIFE_UNROLL_UPDATES")
    if env is not None:
        return env != "0"
    return jax.default_backend() == "cpu"


def _rectifier(name):
    if name == "relu":
        return lambda x, eps: jnp.maximum(x, -eps)
    if name == "elu":
        return lambda x, eps: eps * (jnp.exp(jnp.minimum(x / eps, 0.0)) - 1.0) \
            + jnp.maximum(x, 0.0)
    raise ValueError(f"unknown rectifier '{name}'")


def ppo_loss(cfg: PPOConfig, net, params, obs, action, old_pi, old_value,
             returns, advantages):
    """Loss over one minibatch.  All reductions are full means, so any
    leading batch layout works — the sharded trainer passes
    (T, S, M, ...) with S the data-shard axis."""
    logits, value = net.apply(params["net"], obs)
    probs = jax.nn.softmax(logits)
    a_pi = jnp.take_along_axis(probs, action[..., None], axis=-1)[..., 0]

    pw = jnp.asarray(cfg.policy_discount_weights, jnp.float32)
    vw = jnp.asarray(cfg.value_discount_weights, jnp.float32)

    prob_diff = jnp.sign(advantages) * (1.0 - a_pi / old_pi)[..., None]
    if cfg.rescale_policy_eps:
        eps = cfg.eps_clip * (1.0 + cfg.min_eps_rescale - old_pi)[..., None]
    else:
        eps = jnp.float32(cfg.eps_clip)
    rect = _rectifier(cfg.policy_rectifier)
    policy_loss = jnp.mean(
        jnp.abs(advantages) * rect(prob_diff, eps) * pw)

    entropy = -jnp.sum(probs * jnp.log(probs + 1e-12), axis=-1)
    pseudo_entropy = jnp.sum(probs * (1.0 - probs), axis=-1)
    if not cfg.entropy_grad:
        pseudo_entropy = jax.lax.stop_gradient(pseudo_entropy)
    avg_pe = jnp.mean(pseudo_entropy)
    spe = params["spe"]
    entropy_loss = -cfg.entropy_reg * jnp.minimum(avg_pe, cfg.entropy_clip)
    entropy_loss += 0.5 * jnp.square(jax.lax.stop_gradient(avg_pe) - spe)

    v_clip = old_value + jnp.clip(value - old_value, -cfg.eps_clip, cfg.eps_clip)
    value_loss = jnp.maximum(
        jnp.square(value - returns), jnp.square(v_clip - returns))
    if cfg.value_grad_rescaling == "per_state":
        value_loss = value_loss * pseudo_entropy[..., None]
    elif cfg.value_grad_rescaling == "per_batch":
        value_loss = value_loss * avg_pe
    elif cfg.value_grad_rescaling == "smooth":
        value_loss = value_loss * jax.lax.stop_gradient(spe)
    elif cfg.value_grad_rescaling:
        raise ValueError(
            f"unknown value_grad_rescaling '{cfg.value_grad_rescaling}'")
    value_loss = 0.5 * jnp.mean(value_loss * vw)

    total = policy_loss + cfg.vf_coef * value_loss + entropy_loss
    metrics = dict(
        policy_loss=policy_loss, value_loss=value_loss,
        entropy=jnp.mean(entropy), pseudo_entropy=avg_pe,
        smoothed_pseudo_entropy=spe,
    )
    return total, metrics


# ---------------------------------------------------------------------------
# One fully-fused training batch: rollout + GAE + epochs x minibatches
# ---------------------------------------------------------------------------

class PPO:
    """Binds config + net + env into jitted train/rollout steps.

    Usage::

        ppo = PPO(cfg, net, env, tx)
        ts = init_train_state(cfg, net, obs_shape, key, ppo.tx)
        train_state, env_state, obs, metrics = ppo.train_batch(
            ts, env_state, obs, bank, key)
    """

    def __init__(self, cfg: PPOConfig, net, env, tx=None):
        self.cfg = cfg
        self.net = net
        self.env = env
        self.tx = tx or make_optimizer(cfg)

    def __hash__(self):
        return hash((self.cfg, self.env))

    def __eq__(self, other):
        return (type(other) is type(self) and other.cfg == self.cfg
                and other.env == self.env
                and other.net == self.net)

    @partial(jax.jit, static_argnames=("self",))
    def train_batch(self, train_state, env_state, obs, bank, key):
        cfg = self.cfg
        k_roll, k_perm = jax.random.split(key)
        env_state, obs, traj, epstats = rollout(
            cfg, self.net, self.env, bank, train_state.params,
            env_state, obs, k_roll)
        returns, advantages = compute_gae(cfg, traj.reward, traj.done, traj.value)

        batch = traj.action.shape[1]
        n_mb = cfg.num_minibatches
        n_sh = cfg.data_shards
        assert batch % n_sh == 0, "batch must divide data_shards"
        local = batch // n_sh
        assert local % n_mb == 0, \
            "per-shard batch must divide num_minibatches"
        mb_local = local // n_mb

        # (T, B, ...) -> (T, S, B/S, ...): axis 1 carries the data sharding.
        # Each shard shuffles and minibatches ITS OWN envs (axis 2), so the
        # epoch loop is collective-free except the gradient all-reduce.  A
        # single global permutation instead makes GSPMD gather the whole
        # minibatch to every device (measured ~3 MB/minibatch at 2 shards
        # vs the ~1.5 MB gradient all-reduce that should dominate).
        split = lambda x: x.reshape(  # noqa: E731
            (x.shape[0], n_sh, local) + x.shape[2:])
        data = jax.tree.map(split, (traj.obs, traj.action, traj.old_pi,
                                    traj.value[:-1], returns, advantages))

        def one_epoch(carry, key_e):
            params, opt_state = carry
            perm = jax.vmap(lambda k: jax.random.permutation(k, local))(
                jax.random.split(key_e, n_sh))  # (S, local)

            def shuffle(x):
                idx = perm.reshape((1, n_sh, local) + (1,) * (x.ndim - 3))
                return jnp.take_along_axis(x, idx, axis=2)

            shuffled = jax.tree.map(shuffle, data)

            def one_minibatch(carry, k):
                params, opt_state = carry
                # Slice this minibatch locally, then move the shard axis to
                # the FRONT: the net flattens leading batch dims, and XLA
                # can only keep a merged axis sharded when the sharded
                # component is outermost — with S in the middle it would
                # all-gather the minibatch and replicate the whole
                # forward/backward instead.
                mb = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, k * mb_local, mb_local, axis=2).swapaxes(0, 1),
                    shuffled)
                (loss, metrics), grads = jax.value_and_grad(
                    ppo_loss, argnums=2, has_aux=True)(
                        cfg, self.net, params, *mb)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            return jax.lax.scan(one_minibatch, (params, opt_state),
                                jnp.arange(n_mb), unroll=_unroll_updates())

        keys = jax.random.split(k_perm, cfg.epochs_per_batch)
        (params, opt_state), metrics = jax.lax.scan(
            one_epoch, (train_state.params, train_state.opt_state), keys,
            unroll=_unroll_updates())
        metrics = jax.tree.map(lambda x: x[-1, -1], metrics)
        metrics.update(
            mean_reward=traj.reward.mean(),
            mean_return=returns.mean(axis=(0, 1)),
            mean_advantage=advantages.mean(axis=(0, 1)),
            mean_value=traj.value.mean(axis=(0, 1)),
            episodes=epstats,
        )
        train_state = TrainState(
            params=params, opt_state=opt_state,
            update_step=train_state.update_step + 1)
        return train_state, env_state, obs, metrics


# ---------------------------------------------------------------------------
# Recurrent (LSTM) variant — the reference's optional recurrent path
# (safelife_ppo.py:168-189: LSTM 512 with mask-reset in a tf.while_loop).
# ---------------------------------------------------------------------------

def rollout_recurrent(cfg, net, env, bank, params, env_state, obs, carry,
                      key):
    """Like :func:`rollout` but threads an RNN carry, resetting it where
    episodes end.  Returns (env_state, obs, carry, traj, carry0, epstats)
    where carry0 is the carry at rollout start (training replays from it).
    """
    key, k_fresh = jax.random.split(key)
    fresh = None
    if getattr(env.config, "auto_reset", False):
        batch = jax.tree.leaves(env_state)[0].shape[-1]
        core_env = env
        while not hasattr(core_env, "sample_fresh_levels"):
            core_env = core_env.env
        fresh = core_env.sample_fresh_levels(bank, batch, k_fresh)
    carry0 = carry

    def policy_step(c, _):
        env_state, obs, carry, key = c
        key, k_act, k_env = jax.random.split(key, 3)
        carry_out, (logits, value) = net.apply(params["net"], obs, carry)
        action = jax.random.categorical(k_act, logits)
        probs = jax.nn.softmax(logits)
        old_pi = jnp.take_along_axis(probs, action[:, None], axis=1)[:, 0]
        new_env_state, ts = env.step(env_state, bank, action, k_env,
                                     fresh_levels=fresh)
        # Mask-reset the carry where an episode ended.
        keep = (~ts.done).astype(jnp.float32)[:, None]
        carry_out = jax.tree.map(lambda x: x * keep, carry_out)
        stats = dict(done=ts.done, times_up=ts.times_up,
                     episode_length=ts.episode_length,
                     episode_reward=ts.episode_reward,
                     perf_completed=ts.perf_completed,
                     perf_possible=ts.perf_possible,
                     level_idx=ts.level_idx,
                     # Pre-reset side-effect cell count, free from the env
                     # kernels; logged per finished episode like the
                     # reference's training records (env_wrappers.py:195-231).
                     side_effects=ts.side_effect_count)
        out = (obs, action.astype(jnp.int32), old_pi, ts.reward, ts.done,
               value, stats)
        return (new_env_state, ts.obs, carry_out, key), out

    (env_state, obs, carry, _), \
        (obs_seq, action, old_pi, reward, done, value, epstats) = \
        jax.lax.scan(policy_step, (env_state, obs, carry, key),
                     length=cfg.steps_per_env)
    _, (_, final_value) = net.apply(params["net"], obs, carry)
    value = jnp.concatenate([value, final_value[None]], axis=0)
    traj = Trajectory(obs=obs_seq, action=action, old_pi=old_pi,
                      reward=reward, done=done, value=value)
    return env_state, obs, carry, traj, carry0, epstats


def _recurrent_forward(net, net_params, obs_seq, done_seq, carry0):
    """Replay a (T, M, ...) obs sequence through the RNN from carry0,
    resetting the carry at episode boundaries.  Returns (logits, values)."""
    def step(carry, x):
        obs, done = x
        carry, (logits, value) = net.apply(net_params, obs, carry)
        keep = (~done).astype(jnp.float32)[:, None]
        carry = jax.tree.map(lambda c: c * keep, carry)
        return carry, (logits, value)

    _, (logits, values) = jax.lax.scan(step, carry0, (obs_seq, done_seq))
    return logits, values


def ppo_loss_recurrent(cfg, net, params, obs, done, carry0, action, old_pi,
                       old_value, returns, advantages):
    """Recurrent counterpart of :func:`ppo_loss` (same losses; the policy
    is evaluated by replaying the sequence through the RNN)."""
    logits, value = _recurrent_forward(net, params["net"], obs, done, carry0)
    probs = jax.nn.softmax(logits)
    a_pi = jnp.take_along_axis(probs, action[..., None], axis=-1)[..., 0]

    pw = jnp.asarray(cfg.policy_discount_weights, jnp.float32)
    vw = jnp.asarray(cfg.value_discount_weights, jnp.float32)
    prob_diff = jnp.sign(advantages) * (1.0 - a_pi / old_pi)[..., None]
    if cfg.rescale_policy_eps:
        eps = cfg.eps_clip * (1.0 + cfg.min_eps_rescale - old_pi)[..., None]
    else:
        eps = jnp.float32(cfg.eps_clip)
    rect = _rectifier(cfg.policy_rectifier)
    policy_loss = jnp.mean(jnp.abs(advantages) * rect(prob_diff, eps) * pw)

    entropy = -jnp.sum(probs * jnp.log(probs + 1e-12), axis=-1)
    pseudo_entropy = jnp.sum(probs * (1.0 - probs), axis=-1)
    if not cfg.entropy_grad:
        pseudo_entropy = jax.lax.stop_gradient(pseudo_entropy)
    avg_pe = jnp.mean(pseudo_entropy)
    spe = params["spe"]
    entropy_loss = -cfg.entropy_reg * jnp.minimum(avg_pe, cfg.entropy_clip)
    entropy_loss += 0.5 * jnp.square(jax.lax.stop_gradient(avg_pe) - spe)

    v_clip = old_value + jnp.clip(value - old_value, -cfg.eps_clip,
                                  cfg.eps_clip)
    value_loss = jnp.maximum(
        jnp.square(value - returns), jnp.square(v_clip - returns))
    if cfg.value_grad_rescaling == "smooth":
        value_loss = value_loss * jax.lax.stop_gradient(spe)
    value_loss = 0.5 * jnp.mean(value_loss * vw)

    total = policy_loss + cfg.vf_coef * value_loss + entropy_loss
    metrics = dict(policy_loss=policy_loss, value_loss=value_loss,
                   entropy=jnp.mean(entropy), pseudo_entropy=avg_pe,
                   smoothed_pseudo_entropy=spe)
    return total, metrics


class RecurrentPPO(PPO):
    """PPO over a recurrent policy (e.g. SafeLifeLSTMNet): the env batch is
    minibatched by whole envs so sequences stay intact (the reference's
    minibatch scheme, ppo.py:510-533)."""

    @partial(jax.jit, static_argnames=("self",))
    def train_batch(self, train_state, env_state, obs, carry, bank, key):
        cfg = self.cfg
        k_roll, k_perm = jax.random.split(key)
        env_state, obs, carry, traj, carry0, epstats = rollout_recurrent(
            cfg, self.net, self.env, bank, train_state.params,
            env_state, obs, carry, k_roll)
        returns, advantages = compute_gae(cfg, traj.reward, traj.done,
                                          traj.value)
        batch = traj.action.shape[1]
        n_mb = cfg.num_minibatches
        n_sh = cfg.data_shards
        assert batch % n_sh == 0, "batch must divide data_shards"
        local = batch // n_sh
        assert local % n_mb == 0, \
            "per-shard batch must divide num_minibatches"
        mb_local = local // n_mb

        # Shard-local minibatching, like the non-recurrent path
        # (train_batch above): each data shard permutes and minibatches
        # ITS OWN envs, so under GSPMD the epoch loop never gathers
        # trajectory data across devices — the only collective left is
        # the gradient all-reduce (gated by tests/test_scaling.py).
        # Minibatches still consist of whole envs (sequences stay intact,
        # the reference's scheme at ppo.py:510-533).
        split_t = lambda x: x.reshape(  # noqa: E731
            (x.shape[0], n_sh, local) + x.shape[2:])
        data = jax.tree.map(split_t, (traj.obs, traj.done, traj.action,
                                      traj.old_pi, traj.value[:-1],
                                      returns, advantages))
        carry_s = jax.tree.map(
            lambda x: x.reshape((n_sh, local) + x.shape[1:]), carry0)

        def one_epoch(c, key_e):
            params, opt_state = c
            perm = jax.vmap(lambda k: jax.random.permutation(k, local))(
                jax.random.split(key_e, n_sh))  # (S, local)

            def shuffle_t(x):
                idx = perm.reshape((1, n_sh, local) + (1,) * (x.ndim - 3))
                return jnp.take_along_axis(x, idx, axis=2)

            def shuffle_c(x):
                idx = perm.reshape((n_sh, local) + (1,) * (x.ndim - 2))
                return jnp.take_along_axis(x, idx, axis=1)

            shuffled = jax.tree.map(shuffle_t, data)
            sh_carry = jax.tree.map(shuffle_c, carry_s)

            def one_minibatch(c, k):
                params, opt_state = c
                # Slice locally, then merge (S, mb) with the sharded axis
                # OUTERMOST in the merged dim so GSPMD keeps the batch
                # sharded through the recurrent forward/backward.
                mb = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, k * mb_local, mb_local, axis=2).reshape(
                        (x.shape[0], n_sh * mb_local) + x.shape[3:]),
                    shuffled)
                mb_carry = jax.tree.map(
                    lambda x: jax.lax.dynamic_slice_in_dim(
                        x, k * mb_local, mb_local, axis=1).reshape(
                        (n_sh * mb_local,) + x.shape[2:]),
                    sh_carry)
                (mb_obs, mb_done, mb_action, mb_old_pi, mb_value,
                 mb_returns, mb_adv) = mb
                (loss, metrics), grads = jax.value_and_grad(
                    ppo_loss_recurrent, argnums=2, has_aux=True)(
                        cfg, self.net, params,
                        mb_obs, mb_done, mb_carry,
                        mb_action, mb_old_pi,
                        mb_value, mb_returns, mb_adv)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            return jax.lax.scan(one_minibatch, (params, opt_state),
                                jnp.arange(n_mb), unroll=_unroll_updates())

        keys = jax.random.split(k_perm, cfg.epochs_per_batch)
        (params, opt_state), metrics = jax.lax.scan(
            one_epoch, (train_state.params, train_state.opt_state), keys,
            unroll=_unroll_updates())
        metrics = jax.tree.map(lambda x: x[-1, -1], metrics)
        metrics.update(mean_reward=traj.reward.mean(), episodes=epstats)
        train_state = TrainState(params=params, opt_state=opt_state,
                                 update_step=train_state.update_step + 1)
        return train_state, env_state, obs, carry, metrics
