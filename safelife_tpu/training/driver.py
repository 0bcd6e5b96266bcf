"""Training driver: env factory, train loop, checkpointing, logging.

Capability parity with ``training/safelife_ppo.py`` (SafeLife-specific
hyperparameters, wrapped env factory, checkpoint/restore incl. global
counters) and the outer loop of ``training/ppo.py:550-559`` — redesigned
around the fused on-device train step: the Python loop only dispatches
jitted ``train_batch`` calls, flushes episode logs, and checkpoints.

Checkpointing uses orbax (sharded-array-aware, multi-host safe): params,
optimizer state, update step, global env counters and the training RNG key
are saved; on restore the env state is rebuilt from the level bank and the
global counters are resynced (the reference does the same for its
``global_counter``, ``safelife_ppo.py:88-106``).
"""

import dataclasses
import logging
import os
import time
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..env.env import BatchedSafeLifeEnv, EnvConfig
from ..env import wrappers as W
from ..levels import loader
from ..utils.integrity import (check_bank_reset_integrity,
                               check_device_integrity)
from ..metrics.logging import (
    EpisodeLogger, log_training_metrics, make_summary_writer)
from .model import SafeLifeCNN
from .ppo import PPO, PPOConfig, TrainState, init_train_state

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    num_envs: int = 16
    total_steps: int = 6_000_000
    report_every: int = 25_000       # env steps between metric flushes
    save_every: int = 500_000        # env steps between checkpoints
    view_shape: Tuple[int, int] = (33, 33)
    time_limit: int = 1000
    impact_penalty: Any = 0.0        # schedulable
    min_performance: Any = 0.01      # schedulable
    movement_bonus: float = 0.1
    seed: int = 0
    logdir: Optional[str] = None
    max_checkpoints: int = 3
    record_videos: bool = True    # capture an episode gif at each checkpoint
    # Periodic frozen-suite evaluation: a suite name / path / LevelBank;
    # None disables.  Results go to eval.yaml + eval/* tensorboard
    # scalars, incl. full EMD side-effect scores.  eval_every sets the
    # cadence in env steps (0 = every checkpoint); the final eval always
    # runs.  A full-suite eval costs ~2x a 500k-step training segment at
    # the 64-env reference batch, so sweeps bound by wall clock thin the
    # cadence without touching checkpoint frequency or the finals.
    eval_suite: Any = None
    eval_every: int = 0
    eval_side_effect_samples: int = 250
    # Endless levels: regenerate the training bank every this many env
    # steps from the current bank factory (0 = fixed bank).  Generation
    # runs on a background thread; the swap happens between batches.
    fresh_levels_every: int = 0
    # Recurrent policy: CNN trunk + LSTM core trained with RecurrentPPO
    # (whole-env minibatches), the reference's optional LSTM path
    # (safelife_ppo.py:168-189).  The LSTM carry is threaded through
    # rollouts and reset at episode ends / bank switches / restores.
    recurrent: bool = False


def _fetch(tree):
    """device_get that also works under a multi-process runtime, where
    batch-sharded arrays span non-addressable devices: all-gather them
    first (every rank then logs identical global stats)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        tree = multihost_utils.process_allgather(tree, tiled=True)
    return jax.device_get(tree)


def make_training_env(cfg: TrainerConfig):
    """The reference's training wrapper stack (safelife_ppo.py:111-139):
    base env (33x33 view) -> MovementBonus -> SideEffectPenalty ->
    Continuing.  (Recording is host-side; see metrics/ and benchmarking.)"""
    env = BatchedSafeLifeEnv(EnvConfig(
        view_shape=cfg.view_shape, time_limit=cfg.time_limit))
    env = W.MovementBonusWrapper(env, movement_bonus=cfg.movement_bonus)
    env = W.SideEffectPenaltyWrapper(
        env, penalty_coef=cfg.impact_penalty,
        min_performance=cfg.min_performance)
    return W.ContinuingWrapper(env)


class Trainer:
    """Owns the training loop for one PPO run."""

    def __init__(self, trainer_cfg: TrainerConfig,
                 ppo_cfg: PPOConfig = PPOConfig(),
                 bank=None,
                 level_paths: Sequence[str] = ("benchmarks/v1.0/append-still.npz",),
                 net=None, env=None, level_names=None,
                 bank_schedule=None, mesh=None, bank_factory=None):
        self.cfg = trainer_cfg
        self.ppo_cfg = ppo_cfg
        self.bank = bank if bank is not None else loader.load_bank(*level_paths)
        self.bank_factory = bank_factory  # regenerates the CURRENT bank
        self._refresher = None            # background bank-regen thread
        self.level_names = level_names
        self.env = env if env is not None else make_training_env(trainer_cfg)
        if trainer_cfg.recurrent:
            from .model import SafeLifeLSTMNet
            from .ppo import RecurrentPPO
            self.net = net or SafeLifeLSTMNet(num_actions=9,
                                              n_gamma=ppo_cfg.n_gamma)
            self.ppo = RecurrentPPO(ppo_cfg, self.net, self.env)
            self.carry = self.net.initial_carry(trainer_cfg.num_envs)
        else:
            self.net = net or SafeLifeCNN(num_actions=9,
                                          n_gamma=ppo_cfg.n_gamma)
            self.ppo = PPO(ppo_cfg, self.net, self.env)
            self.carry = None

        key = jax.random.PRNGKey(trainer_cfg.seed)
        self.key, k_init, k_reset = jax.random.split(key, 3)
        self.env_state = self.env.reset_all(
            self.bank, trainer_cfg.num_envs, k_reset)
        self.obs = self.env.observe(self.env_state)
        self.train_state = init_train_state(
            ppo_cfg, self.net, self.obs.shape[1:], k_init, self.ppo.tx,
            carry=self.carry)

        self.mesh = mesh
        self._shard_all()
        if trainer_cfg.logdir:
            self._write_run_config()
        self.writer = make_summary_writer(trainer_cfg.logdir)
        self.episode_logger = EpisodeLogger(
            os.path.join(trainer_cfg.logdir, "training.yaml")
            if trainer_cfg.logdir else None,
            summary_writer=self.writer)
        self._ckpt_mgr = None
        self._steps_offset = 0  # counters restored from checkpoint
        # Curriculum: [(step_threshold, bank_factory), ...] sorted by step.
        # When the global step crosses a threshold, the level bank is
        # swapped and all envs reset (reference start-training's
        # spawn_loader curriculum, start-training:169-184).
        self.bank_schedule = sorted(bank_schedule or [], key=lambda x: x[0])

    def _write_run_config(self):
        """Persist what's needed to rebuild the policy from the logdir
        (see load_policy)."""
        import json
        os.makedirs(self.cfg.logdir, exist_ok=True)
        with open(os.path.join(self.cfg.logdir, "config.json"), "w") as fh:
            json.dump({
                "view_shape": list(self.cfg.view_shape),
                "n_gamma": self.ppo_cfg.n_gamma,
                "num_actions": 9,
                "time_limit": self.cfg.time_limit,
                "recurrent": self.cfg.recurrent,
            }, fh)

    def _shard_all(self):
        """Place everything on the data-parallel mesh: env state sharded
        over 'data', bank + params + rng replicated.  GSPMD propagates the
        layout through the jitted train step and inserts the gradient
        all-reduce."""
        if self.mesh is None:
            return
        from ..parallel import mesh as pmesh
        self.env_state, self.bank = pmesh.shard_env(
            self.mesh, self.env_state, self.bank)
        self.obs = pmesh.shard_batch_leading(self.mesh, self.obs)
        if self.carry is not None:
            self.carry = pmesh.shard_batch_leading(self.mesh, self.carry)
        self.train_state = pmesh.replicate(self.mesh, self.train_state)
        self.key = pmesh.replicate(self.mesh, self.key)

    # -- checkpointing -----------------------------------------------------

    @property
    def checkpoint_manager(self):
        if self._ckpt_mgr is None and self.cfg.logdir:
            import orbax.checkpoint as ocp
            self._ckpt_mgr = ocp.CheckpointManager(
                os.path.abspath(os.path.join(self.cfg.logdir, "checkpoints")),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.cfg.max_checkpoints, create=True))
        return self._ckpt_mgr

    def global_step(self):
        return int(W.unwrap(self.env_state).num_steps) + self._steps_offset

    def save_checkpoint(self):
        mgr = self.checkpoint_manager
        if mgr is None:
            return
        import orbax.checkpoint as ocp
        core = W.unwrap(self.env_state)
        payload = {
            "train_state": self.train_state,
            "key": self.key,
            "counters": {
                "num_steps": core.num_steps + self._steps_offset,
                "episodes_started": core.episodes_started,
                "episodes_completed": core.episodes_completed,
            },
        }
        mgr.save(self.global_step(), args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()  # orbax saves async; commit before return
        logger.info("saved checkpoint at step %d", self.global_step())

    def restore_checkpoint(self, step=None):
        mgr = self.checkpoint_manager
        if mgr is None or mgr.latest_step() is None:
            return False
        import orbax.checkpoint as ocp
        step = step if step is not None else mgr.latest_step()
        template = {
            "train_state": self.train_state,
            "key": self.key,
            "counters": {
                "num_steps": jnp.int32(0),
                "episodes_started": jnp.int32(0),
                "episodes_completed": jnp.int32(0),
            },
        }
        payload = mgr.restore(step, args=ocp.args.StandardRestore(template))
        self.train_state = payload["train_state"]
        self.key = payload["key"]
        # Resync global counters into the fresh env state (reference:
        # safelife_ppo.py:88-106).
        core = W.unwrap(self.env_state)
        self._steps_offset = int(payload["counters"]["num_steps"])
        core = core.replace(
            num_steps=jnp.int32(0),
            episodes_started=payload["counters"]["episodes_started"],
            episodes_completed=payload["counters"]["episodes_completed"])
        self.env_state = W.replace_core(self.env_state, core)
        self._shard_all()
        logger.info("restored checkpoint from step %d", step)
        return True

    # -- training ----------------------------------------------------------

    def train(self, total_steps=None, progress_fn: Optional[Callable] = None):
        total = total_steps or self.cfg.total_steps
        steps_per_batch = self.ppo_cfg.steps_per_env * self.cfg.num_envs
        next_report = 0
        next_save = self.global_step() + self.cfg.save_every
        eval_every = self.cfg.eval_every or self.cfg.save_every
        next_eval = self.global_step() + eval_every
        t0 = time.time()
        last_steps, last_t = self.global_step(), t0

        # Golden self-check of the device compute path before any training
        # signal is trusted; repeated at every checkpoint/eval and at the
        # end (utils/integrity.py — a degrading remote TPU once returned
        # all-zero scores at full speed, fabricating perfect prune runs,
        # and on 2026-08-19 a lossy default-precision MXU gather stripped
        # ALIVE bits from every reset, so the training bank itself is
        # probed through the real reset gather too).
        check_device_integrity()
        check_bank_reset_integrity(self.bank)

        # Ops-level crash-resume marker (reference start-training:53-66:
        # active_job.txt lets a restarted box resume its run).
        marker = None
        if self.cfg.logdir:
            marker = os.path.join(self.cfg.logdir, "active_job.txt")
            with open(marker, "w") as fh:
                fh.write(f"{os.getpid()} step={self.global_step()}\n")

        pending_eps = []  # device-side episode stats, flushed at report time
        while self.global_step() < total:
            self._maybe_switch_bank()
            self.key, k = jax.random.split(self.key)
            if self.carry is not None:
                (self.train_state, self.env_state, self.obs, self.carry,
                 metrics) = self.ppo.train_batch(
                    self.train_state, self.env_state, self.obs, self.carry,
                    self.bank, k)
            else:
                (self.train_state, self.env_state, self.obs, metrics) = \
                    self.ppo.train_batch(self.train_state, self.env_state,
                                         self.obs, self.bank, k)
            pending_eps.append(metrics.pop("episodes"))
            step = self.global_step()

            if step >= next_report:
                metrics = _fetch(metrics)
                eps = _fetch(pending_eps)
                pending_eps = []
                eps = {k2: np.concatenate([e[k2] for e in eps])
                       for k2 in eps[0]}
                self.episode_logger.log_batch(
                    eps, global_step=step, level_names=self.level_names)
                log_training_metrics(self.writer, metrics, step)
                now = time.time()
                sps = (step - last_steps) / max(now - last_t, 1e-9)
                last_steps, last_t = step, now
                if self.writer:
                    self.writer.add_scalar("perf/env_steps_per_sec", sps, step)
                logger.info(
                    "step %d/%d  reward=%.3f  entropy=%.3f  %.0f steps/s",
                    step, total, float(metrics["mean_reward"]),
                    float(metrics["entropy"]), sps)
                if progress_fn:
                    progress_fn(step, metrics)
                next_report = step + self.cfg.report_every

            self._maybe_refresh_bank(step)

            if step >= next_save:
                self.save_checkpoint()
                self.maybe_record_video()
                if step >= next_eval:
                    self.evaluate()
                    next_eval = step + eval_every
                next_save = step + self.cfg.save_every

        self.save_checkpoint()
        self.evaluate()  # final frozen-suite numbers
        check_device_integrity()  # a corrupted run must not finish quietly
        if marker and os.path.exists(marker):
            os.remove(marker)  # clean exit: no restart needed
        if self.writer:
            self.writer.flush()
        logger.info("training done: %d env steps in %.1fs",
                    self.global_step(), time.time() - t0)
        return self.train_state

    def _maybe_switch_bank(self):
        while self.bank_schedule and \
                self.global_step() >= self.bank_schedule[0][0]:
            _, factory = self.bank_schedule.pop(0)
            logger.info("curriculum: switching level bank at step %d",
                        self.global_step())
            if callable(factory):
                self.bank_factory = factory  # endless-levels regen source
            self.bank = factory() if callable(factory) else factory
            offset = self.global_step()
            self.key, k = jax.random.split(self.key)
            self.env_state = self.env.reset_all(
                self.bank, self.cfg.num_envs, k)
            self.obs = self.env.observe(self.env_state)
            if self.carry is not None:  # fresh episodes: fresh RNN state
                self.carry = self.net.initial_carry(self.cfg.num_envs)
            # reset_all zeroes the global counters; fold them into offset
            self._steps_offset = offset
            self._shard_all()

    def _maybe_refresh_bank(self, step):
        """Endless levels (reference: the safelife_loader generates forever,
        file_finder.py:143-201): regenerate the training bank from its
        factory every ``fresh_levels_every`` env steps on a background
        thread, swapping it in between batches.  Auto-resets gather from
        the bank each rollout, so a swap changes all FUTURE episodes
        without disturbing running ones (shapes are identical — no
        recompile)."""
        if not self.cfg.fresh_levels_every or self.bank_factory is None:
            return
        if self._refresher is not None:
            if self._refresher["thread"].is_alive():
                return
            new_bank = self._refresher["out"].get("bank")
            self._refresher = None
            if new_bank is not None:
                if self.mesh is not None:
                    from ..parallel import mesh as pmesh
                    new_bank = jax.device_put(
                        new_bank, pmesh.bank_shardings(self.mesh, new_bank))
                self.bank = new_bank
                logger.info("endless levels: fresh bank at step %d", step)
            return
        if step >= getattr(self, "_next_refresh", self.cfg.fresh_levels_every):
            self._next_refresh = step + self.cfg.fresh_levels_every
            import threading
            out = {}

            def gen():
                try:
                    out["bank"] = self.bank_factory()
                except Exception:  # pragma: no cover
                    logger.exception("bank regeneration failed")

            th = threading.Thread(target=gen, daemon=True)
            th.start()
            self._refresher = {"thread": th, "out": out}

    def evaluate(self):
        """Frozen-suite evaluation into the training stream: mean
        performance + full EMD side-effect scores on a held-out suite
        (reference RecordingSafeLifeWrapper logs per-episode side effects,
        env_wrappers.py:195-231; here the exact scoring runs on the eval
        suite at checkpoint cadence while every training episode logs its
        in-kernel side-effect cell count)."""
        if self.cfg.eval_suite is None:
            return None
        from ..benchmarking import run_benchmark, summarize
        check_device_integrity()  # don't log numbers a sick chip fabricated
        step = self.global_step()
        results = run_benchmark(
            self.cfg.eval_suite, self.policy_fn(),
            logfile=os.path.join(self.cfg.logdir, "eval.yaml")
            if self.cfg.logdir else None,
            key=jax.random.PRNGKey(self.cfg.seed + step),
            view_shape=self.cfg.view_shape,
            time_limit=self.cfg.time_limit,
            side_effect_samples=self.cfg.eval_side_effect_samples)
        perf = float(np.mean(results["performance"]))
        # Dead-start watchdog: in round 4 an append-dynamic seed sat at
        # EXACTLY 0.000 mean_perf for its first 2.5M steps before
        # recovering.  A trained-for-millions-of-steps policy scoring
        # exactly zero on a goal-bearing suite means the agent has never
        # once completed a goal cell — flag it loudly (TB scalar +
        # warning) so a stuck seed is visible long before the run ends.
        # Navigation-style suites (no goal patterns, possible == 0 by
        # construction) are exempt.
        has_goals = bool(np.any(np.asarray(results["possible"]) > 0))
        dead = has_goals and perf == 0.0 and step >= 1_000_000
        if dead:
            self.dead_start_evals = getattr(self, "dead_start_evals", 0) + 1
            logger.warning(
                "DEAD START: eval mean_perf is exactly 0.000 at step %d "
                "(%d consecutive flagged evals) — the policy has never "
                "completed a goal cell; check entropy collapse / reward "
                "sparsity / the training bank", step, self.dead_start_evals)
        else:
            self.dead_start_evals = 0
        if self.writer:
            self.writer.add_scalar("eval/dead_start",
                                   float(dead), step)
            self.writer.add_scalar("eval/performance", perf, step)
            self.writer.add_scalar(
                "eval/reward", float(np.mean(results["reward"])), step)
            self.writer.add_scalar(
                "eval/length", float(np.mean(results["length"])), step)
            if "side_effects" in results:
                self.writer.add_scalar(
                    "eval/side_effects",
                    float(np.mean(results["side_effects"])), step)
        logger.info("eval @ %d: %s", step, summarize(results))
        return results

    def maybe_record_video(self):
        if not (self.cfg.record_videos and self.cfg.logdir):
            return
        from ..metrics.recording import record_episode, save_trajectory
        self.key, k = jax.random.split(self.key)
        traj = record_episode(
            self.env, self.bank, self.policy_fn(), k,
            level_idx=int(jax.random.randint(
                k, (), 0, self.bank.num_levels)),
            max_steps=self.cfg.time_limit)
        save_trajectory(traj, os.path.join(
            self.cfg.logdir, f"episode-{self.global_step()}"))

    def policy_fn(self):
        """Sampling policy for eval/recording.  The jitted function takes
        ``params`` as a TRACED argument and is cached on the trainer —
        closing over the current params instead would bake them in as
        constants and force a full recompile at every checkpoint."""
        if not hasattr(self, "_policy_jit"):
            net = self.net
            if self.cfg.recurrent:
                @jax.jit
                def policy(params, obs, carry, key):
                    carry, (logits, _) = net.apply(params, obs, carry)
                    return jax.random.categorical(key, logits), carry
            else:
                @jax.jit
                def policy(params, obs, key):
                    logits, _ = net.apply(params, obs)
                    return jax.random.categorical(key, logits)
            self._policy_jit = policy
        jit = self._policy_jit
        params = self.train_state.params["net"]
        if self.cfg.recurrent:
            wrapped = lambda obs, carry, key: jit(params, obs, carry, key)  # noqa: E731
            wrapped.recurrent = True
            wrapped.init_carry = self.net.initial_carry
        else:
            wrapped = lambda obs, key: jit(params, obs, key)  # noqa: E731
        wrapped.params = params
        wrapped.raw = jit
        return wrapped


def _restore_step(ckpt_root, step):
    """Device-agnostic orbax restore of one checkpoint step.

    Loads every leaf onto the current default device with an explicit
    sharding instead of the recorded one — a checkpoint written during
    TPU training must be loadable by a CPU eval/analysis process (the
    recorded sharding names devices that don't exist there)."""
    import orbax.checkpoint as ocp

    path = os.path.join(ckpt_root, str(step), "default")
    ckptr = ocp.PyTreeCheckpointer()
    tree = ckptr.metadata(path).item_metadata
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    restore_args = jax.tree.map(
        lambda _: ocp.ArrayRestoreArgs(sharding=sharding), tree)
    return ckptr.restore(
        path, args=ocp.args.PyTreeRestore(restore_args=restore_args))


def load_policy(logdir):
    """Rebuild a sampling policy from a training logdir.

    Returns (policy_fn(obs, key) -> actions, view_shape).
    """
    import json

    import orbax.checkpoint as ocp

    with open(os.path.join(logdir, "config.json")) as fh:
        run_cfg = json.load(fh)
    recurrent = run_cfg.get("recurrent", False)
    if recurrent:
        from .model import SafeLifeLSTMNet
        net = SafeLifeLSTMNet(num_actions=run_cfg.get("num_actions", 9),
                              n_gamma=run_cfg.get("n_gamma", 1))
    else:
        net = SafeLifeCNN(num_actions=run_cfg.get("num_actions", 9),
                          n_gamma=run_cfg.get("n_gamma", 1))
    ckpt_root = os.path.abspath(os.path.join(logdir, "checkpoints"))
    mgr = ocp.CheckpointManager(ckpt_root)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {logdir}")
    payload = _restore_step(ckpt_root, step)
    params = payload["train_state"]["params"]["net"]

    if recurrent:
        @jax.jit
        def raw(params, obs, carry, key):
            carry, (logits, _) = net.apply(params, obs, carry)
            return jax.random.categorical(key, logits), carry

        policy = lambda obs, carry, key: raw(params, obs, carry, key)  # noqa: E731
        policy.recurrent = True
        policy.init_carry = net.initial_carry
        policy.raw = raw
        policy.params = params
        return policy, tuple(run_cfg["view_shape"])

    @jax.jit
    def policy(obs, key):
        logits, _ = net.apply(params, obs)
        return jax.random.categorical(key, logits)

    return policy, tuple(run_cfg["view_shape"])
