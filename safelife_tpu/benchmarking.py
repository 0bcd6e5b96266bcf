"""Benchmark runner: evaluate a policy over frozen benchmark suites.

Capability parity with ``safelife/benchmarking.py`` (``run_benchmark``
over ``benchmarks/v1.0/<name>`` with YAML logging and ``load_benchmarks``
for analysis), redesigned for lockstep: instead of 10 round-robin host
envs, ALL levels of the suite run simultaneously as one device batch;
each level's stats are captured at its first episode end.
"""

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .env.env import BatchedSafeLifeEnv, EnvConfig
from .levels import loader

BENCHMARK_ROOT = "benchmarks/v1.0"


def random_policy(num_actions=9):
    def policy(obs, key):
        return jax.random.randint(key, (obs.shape[0],), 0, num_actions)
    return policy


@partial(jax.jit,
         static_argnames=("env", "policy", "raw_policy", "chunk",
                          "recurrent"))
def _run_chunk(env, policy, raw_policy, chunk, params, bank, state, obs,
               rec, key, rnn_carry=None, recurrent=False):
    """One ``chunk``-step scan of a suite evaluation.

    Module-level with the env/policy as STATIC and the weights/bank as
    traced arguments, so repeated in-training evals (Trainer.evaluate at
    every checkpoint) hit the jit cache instead of recompiling — envs
    hash by config, and a Trainer's ``raw_policy`` is a stable cached
    function.  With ``recurrent=True`` the raw policy is invoked as
    ``raw(params, obs, rnn_carry, key) -> (action, rnn_carry)`` and the
    RNN state is threaded through the scan (eval suites don't auto-reset,
    so no per-episode carry masking is needed)."""
    def body(carry, _):
        state, obs, rec, key, rnn = carry
        key, k_act, k_env = jax.random.split(key, 3)
        if recurrent:
            action, rnn = raw_policy(params, obs, rnn, k_act)
        elif raw_policy is not None:
            action = raw_policy(params, obs, k_act)
        else:
            action = policy(obs, k_act)
        state, ts = env.step(state, bank, action, k_env)
        newly = ts.done & ~rec["done"]
        rec = dict(
            done=rec["done"] | ts.done,
            length=jnp.where(newly, ts.episode_length, rec["length"]),
            reward=jnp.where(newly, ts.episode_reward, rec["reward"]),
            completed=jnp.where(newly, ts.perf_completed,
                                rec["completed"]),
            possible=jnp.where(newly, ts.perf_possible, rec["possible"]),
        )
        return (state, ts.obs, rec, key, rnn), None

    (state, obs, rec, key, rnn_carry), _ = jax.lax.scan(
        body, (state, obs, rec, key, rnn_carry), length=chunk)
    return state, obs, rec, key, rnn_carry


def run_benchmark(benchmark_name, policy, logfile=None, key=None,
                  view_shape=(25, 25), time_limit=1000, chunk=64,
                  side_effect_samples=0, pad_to_lanes=None):
    """Run ``policy(obs, key) -> actions`` over every level of a suite.

    benchmark_name: suite name (e.g. "append-still"), a path, or a
    prebuilt LevelBank.  Returns a dict of numpy arrays (one entry per
    level): length, reward, completed, possible, performance  (+
    side_effects when side_effect_samples > 0).

    A policy carrying ``.raw``/``.params`` attributes (Trainer.policy_fn)
    is invoked as ``raw(params, obs, key)`` with params traced, so
    repeated in-training evals reuse the compiled program instead of
    baking the weights in as constants.

    ``pad_to_lanes`` tiles the level batch up to a multiple of the TPU
    lane width (128) so the eval rides the fused Pallas step instead of
    falling off the fast path at a 100-level suite size; padding lanes
    replay real levels and are dropped from the results.  Default: pad
    exactly when the fused path is available (a TPU backend) — per-level
    env semantics are batch-size-independent, so results only differ
    through the policy's batched random draws.
    """
    if isinstance(benchmark_name, str):
        path = benchmark_name if os.sep in benchmark_name or \
            benchmark_name.endswith(".npz") else \
            f"{BENCHMARK_ROOT}/{benchmark_name}.npz"
        bank = loader.load_bank(path)
        names = loader.level_names(path)
    else:
        bank = benchmark_name
        names = [f"level-{i}" for i in range(bank.num_levels)]
    # Levels must survive the device reset gather bit-for-bit before any
    # reported number is trusted (utils/integrity.py, 2026-08-19 incident).
    from .utils.integrity import check_bank_reset_integrity
    check_bank_reset_integrity(bank)

    env = BatchedSafeLifeEnv(EnvConfig(
        view_shape=view_shape, time_limit=time_limit, auto_reset=False))
    n = bank.num_levels
    if pad_to_lanes is None:
        from .ops import life_pallas
        pad_to_lanes = life_pallas.available()
    b = -(-n // 128) * 128 if pad_to_lanes else n
    key = key if key is not None else jax.random.PRNGKey(0)
    state = env.reset_to_levels(bank, jnp.arange(b) % n)
    obs = env.observe(state)

    raw_policy = getattr(policy, "raw", None)
    policy_params = getattr(policy, "params", None)
    recurrent = bool(getattr(policy, "recurrent", False))
    rnn_carry = policy.init_carry(b) if recurrent else None
    if raw_policy is not None:
        policy = None  # route through the params-traced path

    rec = dict(done=jnp.zeros(b, bool), length=jnp.zeros(b, jnp.int32),
               reward=jnp.zeros(b, jnp.float32),
               completed=jnp.zeros(b, jnp.int32),
               possible=jnp.zeros(b, jnp.int32))
    t0 = time.time()
    for _ in range(0, time_limit + chunk, chunk):
        state, obs, rec, key, rnn_carry = _run_chunk(
            env, policy, raw_policy, chunk,
            policy_params, bank, state, obs, rec, key,
            rnn_carry=rnn_carry, recurrent=recurrent)
        if bool(rec["done"].all()):
            break
    rec = {k: v[:n] for k, v in jax.device_get(rec).items()}

    results = {
        "name": names,
        "length": rec["length"],
        "reward": rec["reward"],
        "completed": rec["completed"],
        "possible": rec["possible"],
        "performance": rec["completed"] / np.maximum(rec["possible"], 1),
        "wall_time": time.time() - t0,
    }

    if side_effect_samples > 0:
        from .side_effects import side_effect_score_batched
        core = state
        scores, mass = side_effect_score_batched(
            core.init_board, core.board, core.spawn_prob,
            core.episode_length, key, num_samples=side_effect_samples,
            catch_up_steps=time_limit)
        sc, ms = np.asarray(scores)[:, :n], np.asarray(mass)[:, :n]
        results["side_effects"] = sc.sum(axis=0)
        results["side_effect_mass"] = ms.sum(axis=0)
        # Per-cell-type structure, the form the reference reports and the
        # safety analysis consumes (reference side_effects.py:152-161):
        # canonical type name -> ((B,) emd, (B,) inaction mass).
        from .render.text import cell_name
        from .side_effects import DEFAULT_TRACKED
        results["side_effects_by_type"] = {
            cell_name(k): (sc[j], ms[j])
            for j, k in enumerate(DEFAULT_TRACKED)}

    if logfile:
        os.makedirs(os.path.dirname(os.path.abspath(logfile)), exist_ok=True)
        with open(logfile, "a") as fh:
            for i in range(n):
                entry = {
                    "name": str(results["name"][i]),
                    "length": int(results["length"][i]),
                    "reward": round(float(results["reward"][i]), 3),
                    "completed": int(results["completed"][i]),
                    "possible": int(results["possible"][i]),
                    "performance": round(float(results["performance"][i]), 4),
                }
                if "side_effects" in results:
                    entry["side_effects"] = round(
                        float(results["side_effects"][i]), 3)
                items = ", ".join(f"{k}: {v}" for k, v in entry.items())
                if "side_effects_by_type" in results:
                    # (emd, inaction-mass) pairs per canonical cell type
                    # present on this level, reference YAML form.
                    per = ", ".join(
                        f"{name}: [{float(s[i]):.3f}, {float(m[i]):.3f}]"
                        for name, (s, m)
                        in results["side_effects_by_type"].items()
                        if m[i] > 0 or s[i] > 0)
                    items += f", side_effects_by_type: {{{per}}}"
                fh.write(f"- {{{items}}}\n")
    return results


def load_benchmarks(logfile):
    """Parse a benchmark YAML log back into numpy arrays."""
    import yaml

    with open(logfile) as fh:
        records = yaml.safe_load(fh) or []
    if not records:
        return {}
    keys = records[0].keys()
    out = {}
    for k in keys:
        vals = [r.get(k) for r in records]
        out[k] = np.array(vals) if not isinstance(vals[0], str) \
            else np.array(vals, dtype=object)
    return out


def summarize(results):
    """One-line human summary of a run_benchmark result dict."""
    perf = np.asarray(results["performance"], float)
    line = (f"levels={len(perf)} mean_perf={perf.mean():.3f} "
            f"median_perf={np.median(perf):.3f} "
            f"mean_reward={np.mean(results['reward']):.2f} "
            f"mean_length={np.mean(results['length']):.1f}")
    if "side_effects" in results:
        line += f" mean_side_effects={np.mean(results['side_effects']):.3f}"
    return line
