#!/usr/bin/env python
"""Data-parallel scaling report for the full PPO train step.

Weak-scales the sharded ``PPO.train_batch`` over an n-device mesh for
n in {1, 2, 4, 8} (fixed envs-per-device) and reports, per size:

* per-device FLOPs from XLA's cost analysis (must stay flat — proof the
  sharding actually divides the work),
* cross-replica collective traffic parsed from the optimized HLO (the
  gradient all-reduce; must stay O(param bytes), independent of n),
* the ICI-bound weak-scaling efficiency model for TPU v5e
  (``dp_efficiency_model``): T_c / (T_c + T_allreduce).

Wall-clock weak scaling cannot be measured on this box — the CI image has
ONE physical core faking an 8-device mesh, so elapsed time scales ~1/n by
construction.  The HLO-derived numbers are machine-independent: the same
program, compiled with the same GSPMD shardings, is what runs on a real
slice.  ``scaling_report`` (wall-clock) remains available for real
multi-device hosts.

Writes SCALING.json at the repo root and prints a table.
"""

import json
import os
import sys

# The TPU image's sitecustomize pins the axon platform via jax.config, so
# an env var alone is not enough — override the config after import, before
# the lazy backend initialization (same dance as tests/conftest.py).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import contextlib  # noqa: E402


@contextlib.contextmanager
def _tpu_lowering():
    """Trace with the TPU's loop structure on this CPU proxy mesh.

    The PPO update scans unroll on the CPU backend (XLA:CPU backward-conv
    workaround, see training/ppo.py:_unroll_updates) — but an unrolled
    graph repeats the gradient all-reduce instruction per minibatch,
    which would inflate the static collective profile 12x vs what the
    rolled TPU program moves per executed update.  Pin the rolled form
    while lowering here.  (Set BEFORE the first trace of these shapes:
    jit caches by shapes/statics, not env vars.)
    """
    old = os.environ.get("SAFELIFE_UNROLL_UPDATES")
    os.environ["SAFELIFE_UNROLL_UPDATES"] = "0"
    try:
        yield
    finally:
        if old is None:
            del os.environ["SAFELIFE_UNROLL_UPDATES"]
        else:
            os.environ["SAFELIFE_UNROLL_UPDATES"] = old


def build(n_devices, envs_per_device=32):
    from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
    from safelife_tpu.levels import synth
    from safelife_tpu.parallel import mesh as pmesh
    from safelife_tpu.training.model import SafeLifeCNN
    from safelife_tpu.training.ppo import PPO, PPOConfig, init_train_state

    devices = jax.devices()[:n_devices]
    mesh = pmesh.make_mesh(n_data=n_devices, devices=devices)
    batch = envs_per_device * n_devices
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(25, 25), time_limit=200))
    bank = synth.synth_bank(8, h=26, w=26, spawners=True)
    cfg = PPOConfig(data_shards=n_devices)  # reference rollout/epoch config
    net = SafeLifeCNN(num_actions=9, n_gamma=cfg.n_gamma)

    key = jax.random.PRNGKey(0)
    k_init, k_reset, k_train = jax.random.split(key, 3)
    state = env.reset_all(bank, batch, k_reset)
    obs = env.observe(state)
    train_state = init_train_state(cfg, net, obs.shape[1:], k_init)

    with mesh:
        state, bank = pmesh.shard_env(mesh, state, bank)
        obs = pmesh.shard_batch_leading(mesh, obs)
        train_state = pmesh.replicate(mesh, train_state)
        k_train = pmesh.replicate(mesh, k_train)
        ppo = PPO(cfg, net, env)
        with _tpu_lowering():
            lowered = ppo.train_batch.lower(
                ppo, train_state, state, obs, bank, k_train)
            compiled = lowered.compile()
    n_params = sum(x.size for x in jax.tree.leaves(train_state.params))
    return compiled, n_params


def build_recurrent(n_devices, envs_per_device=32):
    """Compile RecurrentPPO.train_batch over an n-device mesh (the LSTM
    path must stay collective-free except the gradient all-reduce, like
    the non-recurrent path — gated by tests/test_scaling.py)."""
    from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
    from safelife_tpu.levels import synth
    from safelife_tpu.parallel import mesh as pmesh
    from safelife_tpu.training.model import SafeLifeLSTMNet
    from safelife_tpu.training.ppo import (PPOConfig, RecurrentPPO,
                                           TrainState)

    devices = jax.devices()[:n_devices]
    mesh = pmesh.make_mesh(n_data=n_devices, devices=devices)
    batch = envs_per_device * n_devices
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(25, 25), time_limit=200))
    bank = synth.synth_bank(8, h=26, w=26, spawners=True)
    cfg = PPOConfig(data_shards=n_devices)
    net = SafeLifeLSTMNet(num_actions=9, n_gamma=cfg.n_gamma)

    key = jax.random.PRNGKey(0)
    k_init, k_reset, k_train = jax.random.split(key, 3)
    state = env.reset_all(bank, batch, k_reset)
    obs = env.observe(state)
    carry = SafeLifeLSTMNet.initial_carry(batch)
    import jax.numpy as jnp
    import optax  # noqa: F401
    params = {"net": net.init(k_init, obs, carry), "spe": jnp.float32(1.0)}
    ppo = RecurrentPPO(cfg, net, env)
    train_state = TrainState(params=params, opt_state=ppo.tx.init(params),
                             update_step=jnp.int32(0))

    with mesh:
        state, bank = pmesh.shard_env(mesh, state, bank)
        obs = pmesh.shard_batch_leading(mesh, obs)
        carry = pmesh.shard_batch_leading(mesh, carry)
        train_state = pmesh.replicate(mesh, train_state)
        k_train = pmesh.replicate(mesh, k_train)
        with _tpu_lowering():
            lowered = ppo.train_batch.lower(
                ppo, train_state, state, obs, carry, bank, k_train)
            compiled = lowered.compile()
    n_params = sum(x.size for x in jax.tree.leaves(train_state.params))
    return compiled, n_params


ENVS_PER_DEVICE = 32        # compile size (small: 1-core CI box)
PROD_ENVS_PER_DEVICE = 2048  # production envs/device for the efficiency gate


def fwd_flops_per_obs(view=(25, 25)):
    """Exact forward FLOPs per observation from a loop-free compile (XLA
    cost analysis is exact for straight-line programs; the train step's
    scans are counted once, so its total is not usable directly)."""
    from safelife_tpu.training.model import SafeLifeCNN

    net = SafeLifeCNN(num_actions=9, n_gamma=1)
    obs = np.zeros((1,) + tuple(view) + (15,), np.uint8)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), obs)
    compiled = jax.jit(net.apply).lower(params, obs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0))


def train_batch_flops_per_device(cfg, envs_per_device, f_fwd):
    """Analytic per-device FLOPs of one train_batch: rollout forwards +
    epochs x minibatch forward/backward (bwd ~ 2x fwd)."""
    rollout = cfg.steps_per_env * envs_per_device * f_fwd
    learner_obs = cfg.epochs_per_batch * envs_per_device * cfg.steps_per_env
    return rollout + learner_obs * 3.0 * f_fwd


def main(sizes=(1, 2, 4, 8)):
    from safelife_tpu.parallel.distributed import (
        collective_stats, dp_efficiency_model)
    from safelife_tpu.training.ppo import PPOConfig

    cfg = PPOConfig()
    n_grad_syncs = cfg.epochs_per_batch * cfg.num_minibatches
    f_fwd = fwd_flops_per_obs()
    print(f"forward flops/obs: {f_fwd:.3e}")
    rows = []
    n_params = None
    for n in sizes:
        compiled, n_params = build(n, ENVS_PER_DEVICE)
        stats = collective_stats(compiled)
        ar_bytes = stats["collective_bytes"].get("all-reduce", 0)
        # Compute scales with envs/device; the gradient all-reduce does
        # not (12 param-sized syncs per train_batch regardless of batch).
        eff = {}
        for label, envs in (("small", ENVS_PER_DEVICE),
                            ("prod", PROD_ENVS_PER_DEVICE)):
            flops = train_batch_flops_per_device(cfg, envs, f_fwd)
            eff[label] = dp_efficiency_model(
                n, flops, n_grad_syncs * ar_bytes)
        rows.append(dict(
            devices=n,
            hlo_flops_per_device=stats["flops"],
            collective_bytes=stats["collective_bytes"],
            allreduce_bytes_per_sync=ar_bytes,
            model_efficiency_small=round(eff["small"], 4),
            model_efficiency_prod=round(eff["prod"], 4),
        ))
        print(f"n={n}: hlo_flops/device={stats['flops']:.3e} "
              f"allreduce/sync={ar_bytes/1e6:.2f} MB "
              f"eff@{ENVS_PER_DEVICE}env={eff['small']:.3f} "
              f"eff@{PROD_ENVS_PER_DEVICE}env={eff['prod']:.3f}")

    report = dict(
        param_bytes=int(n_params * 4),
        grad_syncs_per_batch=n_grad_syncs,
        envs_per_device=ENVS_PER_DEVICE,
        prod_envs_per_device=PROD_ENVS_PER_DEVICE,
        note=("per-device FLOPs + HLO collective bytes of the GSPMD train "
              "step; efficiency = ICI-bound weak-scaling model for v5e. "
              "Wall-clock weak scaling is not measurable on this 1-core CI "
              "box (8 virtual devices share the core); the HLO-derived "
              "profile is machine-independent and is what runs on a real "
              "slice.  scaling_report() measures wall-clock on real "
              "multi-device hosts."),
        sizes=rows,
    )
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(out, "w") as fh:
        json.dump(report, fh, indent=2)
    print("wrote", out)
    return report


if __name__ == "__main__":
    main()
