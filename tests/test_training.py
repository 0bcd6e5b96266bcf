"""Training pipeline smoke tests: the full PPO train step learns on a
trivial setup, episode stats flow to the logger, and checkpoints
round-trip."""

import pytest

import os

import jax
import jax.numpy as jnp
import numpy as np

from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.levels import synth
from safelife_tpu.training.driver import Trainer, TrainerConfig
from safelife_tpu.training.model import SafeLifeCNN
from safelife_tpu.training.ppo import PPOConfig

pytestmark = pytest.mark.heavy


def tiny_trainer(tmpdir=None, **kw):
    bank = synth.synth_bank(4, h=13, w=13)
    tc = TrainerConfig(
        num_envs=8, total_steps=2000, report_every=500, save_every=1000,
        view_shape=(17, 17), time_limit=30,
        logdir=str(tmpdir) if tmpdir else None, **kw)
    pc = PPOConfig(steps_per_env=8, num_minibatches=2, epochs_per_batch=2)
    return Trainer(tc, pc, bank=bank)


def test_train_aborts_on_corrupted_device(monkeypatch):
    """The integrity guard is wired into the train loop: a device that
    returns wrong values must abort training before any signal is
    trusted (see utils/integrity.py for the incident this encodes)."""
    import pytest

    from safelife_tpu.utils import integrity

    real = integrity._device_outputs

    def corrupted(*args):
        out = dict(real(*args))
        out["points"] = out["points"] * 0
        return out

    monkeypatch.setattr(integrity, "_device_outputs", corrupted)
    tr = tiny_trainer()
    with pytest.raises(integrity.DeviceIntegrityError):
        tr.train(total_steps=100)


def test_train_loop_runs_and_logs(tmp_path):
    tr = tiny_trainer(tmp_path)
    seen = []
    tr.train(total_steps=1500, progress_fn=lambda s, m: seen.append(s))
    assert tr.global_step() >= 1500
    assert seen, "progress_fn never called"
    assert tr.episode_logger.num_episodes > 0, "no episodes completed"
    # YAML episode log written
    log = os.path.join(str(tmp_path), "training.yaml")
    assert os.path.exists(log) and os.path.getsize(log) > 0
    # metrics are finite
    assert np.isfinite(float(jnp.sum(
        sum(jnp.sum(x) for x in jax.tree.leaves(
            tr.train_state.params["net"])))))


def test_checkpoint_roundtrip(tmp_path):
    tr = tiny_trainer(tmp_path)
    tr.train(total_steps=1200)
    step = tr.global_step()
    params_before = jax.device_get(tr.train_state.params)

    tr2 = tiny_trainer(tmp_path)
    assert tr2.restore_checkpoint()
    assert tr2.global_step() >= 1200
    params_after = jax.device_get(tr2.train_state.params)
    jax.tree.map(np.testing.assert_array_equal, params_before, params_after)
    # Training can continue from the restored state.
    tr2.train(total_steps=step + 300)
    assert tr2.global_step() >= step + 300


def test_policy_improves_with_dense_reward():
    """PPO learning smoke test: with a dense movement bonus (reward
    proportional to speed) on an empty walled board, the learned policy's
    mean reward must clearly beat the random-policy baseline."""
    levels = []
    for i in range(4):
        lv = synth.simple_level(9, 9, seed=i)
        lv["board"][(lv["board"] & 1) != 0] = 0  # drop life cells
        lv["goals"][:] = 0
        levels.append(lv)
    from safelife_tpu.levels.loader import build_bank
    bank = build_bank(levels)
    tc = TrainerConfig(num_envs=32, view_shape=(17, 17), time_limit=100,
                       movement_bonus=0.3, seed=1, report_every=2000)
    pc = PPOConfig(steps_per_env=16, num_minibatches=2, epochs_per_batch=3,
                   entropy_reg=0.01, learning_rate=1e-3)
    # Max-speed movement pays 0.3 * speed ** 0.01 ~ 0.3/step; random
    # actions move the agent less than half the time.
    tr = Trainer(tc, pc, bank=bank)
    rewards = []
    tr.train(total_steps=25_000,
             progress_fn=lambda s, m: rewards.append(float(m["mean_reward"])))
    early = np.mean(rewards[:2])
    late = np.mean(rewards[-2:])
    assert late > early + 0.01, (early, late)


def test_eval_every_thins_eval_cadence(monkeypatch):
    """eval_every decouples the frozen-suite eval cadence from checkpoint
    frequency (a full eval costs ~2x a 500k training segment, so sweeps
    thin it) — checkpoints still land at save_every and the final eval
    always runs."""
    tr = tiny_trainer(eval_every=2000)  # save_every=1000, total=2000
    saves, evals = [], []
    monkeypatch.setattr(tr, "save_checkpoint",
                        lambda: saves.append(tr.global_step()))
    monkeypatch.setattr(tr, "evaluate",
                        lambda: evals.append(tr.global_step()))
    tr.train(total_steps=2000)
    assert len(saves) >= 2, f"checkpoints thinned too: {saves}"
    # One mid-run eval (at >=2000... none before it) + the final eval.
    assert len(evals) < len(saves), (saves, evals)
    assert evals[-1] == saves[-1], "final eval must run"


def test_curriculum_bank_switch():
    """The trainer swaps level banks when the step threshold is crossed."""
    from safelife_tpu.levels import synth
    bank_a = synth.synth_bank(2, h=13, w=13)
    bank_b = synth.synth_bank(2, h=13, w=13, spawners=True)
    tc = TrainerConfig(num_envs=8, view_shape=(17, 17), time_limit=20,
                       report_every=10**9, save_every=10**9)
    pc = PPOConfig(steps_per_env=4, num_minibatches=2, epochs_per_batch=1)
    tr = Trainer(tc, pc, bank=bank_a,
                 bank_schedule=[(300, lambda: bank_b)])
    tr.train(total_steps=700)
    assert not tr.bank_schedule, "schedule not consumed"
    assert bool((np.asarray(tr.bank.spawn_prob) > 0).all())
    assert tr.global_step() >= 700


def test_mesh_data_parallel_training():
    """Full train loop over an 8-device mesh: counters advance, params
    stay replicated, metrics finite."""
    from safelife_tpu.levels import synth
    from safelife_tpu.parallel import mesh as pmesh

    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8
    bank = synth.synth_bank(4, h=13, w=13)
    tc = TrainerConfig(num_envs=16, view_shape=(17, 17), time_limit=20,
                       report_every=200, save_every=10**9)
    pc = PPOConfig(steps_per_env=4, num_minibatches=2, epochs_per_batch=1)
    with mesh:
        tr = Trainer(tc, pc, bank=bank, mesh=mesh)
        rewards = []
        tr.train(total_steps=600,
                 progress_fn=lambda s, m: rewards.append(m["mean_reward"]))
    assert tr.global_step() >= 600
    assert np.isfinite(rewards).all()
    # params replicated across all devices
    leaf = jax.tree.leaves(tr.train_state.params["net"])[0]
    assert leaf.sharding.is_fully_replicated
    # env boards sharded over the data axis
    from safelife_tpu.env.wrappers import unwrap
    board = unwrap(tr.env_state).board
    assert not board.sharding.is_fully_replicated


def test_load_policy_from_logdir(tmp_path):
    from safelife_tpu.training.driver import load_policy
    tr = tiny_trainer(tmp_path)
    tr.train(total_steps=600)
    tr.save_checkpoint()
    policy, view = load_policy(str(tmp_path))
    assert view == (17, 17)
    obs = jnp.zeros((4, 17, 17, 15), jnp.uint8)
    acts = policy(obs, jax.random.PRNGKey(0))
    assert acts.shape == (4,)
    assert ((np.asarray(acts) >= 0) & (np.asarray(acts) < 9)).all()


def test_endless_levels_eval_and_side_effect_logging(tmp_path):
    """VERDICT #7/#9: training.yaml records carry side-effect counts, the
    frozen-suite eval runs at checkpoint cadence, and the endless-level
    refresher swaps in freshly generated banks mid-run."""
    from safelife_tpu.levels.loader import build_bank
    calls = []

    def factory():
        calls.append(1)
        return build_bank([
            synth.simple_level(13, 13, seed=100 + 10 * len(calls) + i)
            for i in range(4)])

    eval_bank = synth.synth_bank(3, h=13, w=13)
    tc = TrainerConfig(num_envs=8, view_shape=(17, 17), time_limit=20,
                       report_every=400, save_every=800,
                       logdir=str(tmp_path), record_videos=False,
                       eval_suite=eval_bank, eval_side_effect_samples=8,
                       fresh_levels_every=300)
    pc = PPOConfig(steps_per_env=4, num_minibatches=2, epochs_per_batch=1)
    bank0 = factory()
    b0 = np.asarray(bank0.board).copy()
    tr = Trainer(tc, pc, bank=bank0, bank_factory=factory)
    tr.train(total_steps=2000)
    # Endless levels: the factory ran again and the live bank changed.
    assert len(calls) >= 2, "bank factory never re-ran"
    assert not np.array_equal(np.asarray(tr.bank.board), b0), \
        "training bank contents never changed"
    # Per-episode side-effect counts in the training records.
    txt = open(os.path.join(str(tmp_path), "training.yaml")).read()
    assert "side_effects:" in txt
    # Frozen-suite eval wrote its YAML log, with the per-cell-type
    # (emd, inaction-mass) breakdown the reference reports
    # (side_effects.py:152-161).
    eval_log = os.path.join(str(tmp_path), "eval.yaml")
    etxt = open(eval_log).read()
    assert "performance" in etxt
    assert "side_effects_by_type: {" in etxt
    import yaml
    records = yaml.safe_load(etxt)
    per = [r["side_effects_by_type"] for r in records
           if r.get("side_effects_by_type")]
    assert per and all(
        isinstance(v, list) and len(v) == 2
        for r in per for v in r.values())


def test_recurrent_ppo_smoke():
    """The LSTM policy trains end-to-end: one RecurrentPPO train_batch
    produces finite metrics and updates params."""
    from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
    from safelife_tpu.levels import synth
    from safelife_tpu.training.model import SafeLifeLSTMNet
    from safelife_tpu.training.ppo import RecurrentPPO

    bank = synth.synth_bank(2, h=13, w=13)
    env = BatchedSafeLifeEnv(EnvConfig(view_shape=(17, 17), time_limit=12))
    cfg = PPOConfig(steps_per_env=6, num_minibatches=2, epochs_per_batch=1)
    net = SafeLifeLSTMNet(num_actions=9, n_gamma=1)
    batch = 8
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    state = env.reset_all(bank, batch, k1)
    obs = env.observe(state)
    carry = SafeLifeLSTMNet.initial_carry(batch)
    params = {"net": net.init(k2, obs, carry), "spe": jnp.float32(1.0)}
    ppo = RecurrentPPO(cfg, net, env)
    import optax
    from safelife_tpu.training.ppo import TrainState
    ts = TrainState(params=params, opt_state=ppo.tx.init(params),
                    update_step=jnp.int32(0))
    before = jax.device_get(jax.tree.leaves(params["net"])[0])
    for _ in range(2):
        k3, k = jax.random.split(k3)
        ts, state, obs, carry, metrics = ppo.train_batch(
            ts, state, obs, carry, bank, k)
    after = jax.device_get(jax.tree.leaves(ts.params["net"])[0])
    assert np.isfinite(float(metrics["policy_loss"]))
    assert not np.array_equal(before, after), "params did not update"


def test_recurrent_trainer_end_to_end(tmp_path):
    """TrainerConfig(recurrent=True) drives the full loop: RecurrentPPO
    batches, carry threading, checkpointing, the recurrent eval path
    through benchmarking (carry threaded inside the jitted chunk scan),
    and a load_policy round-trip from the written logdir."""
    from safelife_tpu.benchmarking import run_benchmark
    from safelife_tpu.training.driver import load_policy

    bank = synth.synth_bank(4, h=13, w=13)
    tc = TrainerConfig(
        num_envs=8, total_steps=800, report_every=400, save_every=400,
        view_shape=(17, 17), time_limit=20, logdir=str(tmp_path),
        record_videos=True, eval_suite=bank, eval_side_effect_samples=0,
        recurrent=True)
    pc = PPOConfig(steps_per_env=8, num_minibatches=2, epochs_per_batch=1)
    tr = Trainer(tc, pc, bank=bank)
    tr.train(total_steps=500)
    assert tr.global_step() >= 500
    assert tr.carry is not None

    # Policy restores as a recurrent policy and runs a suite eval.
    policy, view = load_policy(str(tmp_path))
    assert getattr(policy, "recurrent", False)
    results = run_benchmark(bank, policy, view_shape=view, time_limit=20,
                            chunk=10)
    assert len(results["performance"]) == bank.num_levels
    assert np.isfinite(results["reward"]).all()
