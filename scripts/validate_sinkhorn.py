#!/usr/bin/env python
"""Per-suite validation of the Sinkhorn EMD against the exact LP solver.

The framework reports side effects from `side_effects.sinkhorn_emd`
(entropic OT on device, eps=0.02); the reference reports exact EMD
(pyemd flow solver, reference side_effects.py:12-56), matched here by the
host `earth_mover_distance` (scipy HiGHS transportation LP).  This script
quantifies the approximation per benchmark suite: it rolls every level of
each suite with a random policy on the CPU backend, accumulates the
action/inaction occupancy distributions exactly as an eval does
(250 samples, the trainer's eval default), scores every (cell type,
episode) pair BOTH ways, and reports per-suite relative error on the
per-episode total score.  Artifact: results/sinkhorn_validation.json
+ a markdown table on stdout (folded into RESULTS.md by hand).

Round-4 verdict follow-up: the bound must be measured on the
distributions the REPORTED numbers come from — trained policies, whose
occupancy is far more concentrated than a random walk's.  With
``--runs <dir>`` the script restores each sweep run's final checkpoint
(scripts/cpu_verify_finals.py's loader) and replays its task suite with
the trained sampling policy instead of random actions; results land in
results/sinkhorn_validation_trained.json keyed by run name.

Usage: python scripts/validate_sinkhorn.py [suite ...]
       python scripts/validate_sinkhorn.py --runs /root/runs
"""

import json
import os
import re
import sys

if os.environ.get("JAX_PLATFORMS") != "cpu" \
        or os.environ.get("PALLAS_AXON_POOL_IPS", None) != "":
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.execv(sys.executable, [sys.executable] + sys.argv)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUITES = ["append-still", "append-dynamic", "append-spawn",
          "prune-still", "prune-still-hard", "prune-dynamic",
          "prune-spawn", "navigation"]
SAMPLES = 250          # trainer eval default (TrainerConfig)
EPS, ITERS = 0.02, 200  # side_effect_score_batched defaults


def validate_suite(suite, time_limit=1000, seed=0, policy=None,
                   view_shape=None):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from safelife_tpu.benchmarking import BENCHMARK_ROOT
    from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
    from safelife_tpu.levels import loader
    from safelife_tpu.side_effects import (DEFAULT_TRACKED,
                                           accumulate_distributions,
                                           earth_mover_distance,
                                           sinkhorn_emd, torus_distances)

    try:
        bank = loader.load_bank(f"{BENCHMARK_ROOT}/{suite}.npz")
    except FileNotFoundError:
        print(f"  {suite}: no suite archive, skipped", file=sys.stderr)
        return None
    n = bank.num_levels
    env = BatchedSafeLifeEnv(EnvConfig(
        use_pallas=False, auto_reset=False, time_limit=time_limit,
        compute_obs=policy is not None,
        view_shape=view_shape or (15, 15)))
    state = env.reset_to_levels(bank, jnp.arange(n))
    key = jax.random.PRNGKey(seed)
    step = jax.jit(lambda s, a, k: env.step(s, bank, a, k))
    recurrent = bool(getattr(policy, "recurrent", False))
    carry = policy.init_carry(n) if recurrent else None
    obs = env.observe(state) if policy is not None else None

    done = np.zeros(n, bool)
    for t in range(time_limit):
        key, k_act, k_env = jax.random.split(key, 3)
        if policy is None:
            actions = jax.random.randint(k_act, (n,), 0, 9)
        elif recurrent:
            actions, carry = policy(obs, carry, k_act)
        else:
            actions = policy(obs, k_act)
        state, ts = step(state, actions, k_env)
        if policy is not None:
            obs = ts.obs
        done |= np.asarray(ts.done)
        if done.all():
            break

    act, inact = accumulate_distributions(
        state.init_board, state.board, state.spawn_prob,
        state.episode_length, SAMPLES, key, DEFAULT_TRACKED,
        catch_up_steps=time_limit)
    act = np.asarray(act)     # (K, H, W, B)
    inact = np.asarray(inact)
    h, w = act.shape[1:3]
    cost = jnp.asarray(torus_distances((h, w)), jnp.float32)

    sink = np.asarray(sinkhorn_emd(
        jnp.asarray(inact).reshape(len(DEFAULT_TRACKED), h * w, n)
        .transpose(0, 2, 1),
        jnp.asarray(act).reshape(len(DEFAULT_TRACKED), h * w, n)
        .transpose(0, 2, 1),
        cost, eps=EPS, iters=ITERS))            # (K, B)

    exact = np.zeros_like(sink)
    pairs = 0
    for k in range(len(DEFAULT_TRACKED)):
        for b in range(n):
            a2, b2 = inact[k, :, :, b], act[k, :, :, b]
            if a2.max() == 0 and b2.max() == 0:
                continue
            exact[k, b] = earth_mover_distance(a2, b2)
            pairs += 1

    tot_sink = sink.sum(axis=0)   # per-episode reported score
    tot_exact = exact.sum(axis=0)
    nz = tot_exact > 1e-6
    rel = np.abs(tot_sink[nz] - tot_exact[nz]) / tot_exact[nz]
    return dict(
        suite=suite, episodes=int(n), scored_pairs=int(pairs),
        mean_exact=float(tot_exact.mean()),
        mean_sinkhorn=float(tot_sink.mean()),
        mean_rel_err=float(rel.mean()) if nz.any() else 0.0,
        p95_rel_err=float(np.percentile(rel, 95)) if nz.any() else 0.0,
        max_rel_err=float(rel.max()) if nz.any() else 0.0,
        episodes_with_effects=int(nz.sum()))


def main_runs(run_dir):
    """Validate on TRAINED policies: every sweep run under ``run_dir``
    replays its task's frozen suite with its final checkpoint's sampling
    policy (CPU), and the Sinkhorn-vs-exact comparison is done on THOSE
    episode distributions."""
    import glob

    from safelife_tpu.training.driver import load_policy

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results",
        "sinkhorn_validation_trained.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)
    for logdir in sorted(glob.glob(os.path.join(run_dir, "*-s[0-9]*"))):
        run = os.path.basename(logdir)
        m = re.match(r"(.+)-s(\d+)$", run)
        if not m or not os.path.isdir(os.path.join(logdir, "checkpoints")):
            continue
        if run in results:
            continue
        if not os.path.exists(logdir + ".done"):
            print(f"  {run}: still training, skipped", file=sys.stderr)
            continue
        task = m.group(1).split("+")[0]
        print(f"validating {run} (suite {task}) ...", file=sys.stderr,
              flush=True)
        try:
            policy, view = load_policy(logdir)
        except Exception as e:
            print(f"  {run}: SKIP ({type(e).__name__}: {e})", flush=True)
            continue
        r = validate_suite(task, policy=policy, view_shape=view)
        if r is None:
            continue
        r["run"] = run
        results[run] = r
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
        print(f"  {run}: mean_rel_err={r['mean_rel_err']:.4f} "
              f"p95={r['p95_rel_err']:.4f} max={r['max_rel_err']:.4f} "
              f"({r['episodes_with_effects']}/{r['episodes']} episodes)",
              flush=True)

    print("\n| run | episodes scored | mean exact EMD | mean Sinkhorn | "
          "mean rel err | p95 rel err |")
    print("|---|---|---|---|---|---|")
    for s, r in sorted(results.items()):
        print(f"| {s} | {r['episodes_with_effects']}/{r['episodes']} "
              f"| {r['mean_exact']:.2f} | {r['mean_sinkhorn']:.2f} "
              f"| {r['mean_rel_err'] * 100:.1f}% "
              f"| {r['p95_rel_err'] * 100:.1f}% |")
    print("wrote", out_path)


def main(suites):
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "sinkhorn_validation.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            results = json.load(fh)
    for suite in suites:
        print(f"validating {suite} ...", file=sys.stderr, flush=True)
        r = validate_suite(suite)
        if r is None:
            continue
        results[suite] = r
        with open(out_path, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
        print(f"  {suite}: mean_rel_err={r['mean_rel_err']:.4f} "
              f"p95={r['p95_rel_err']:.4f} max={r['max_rel_err']:.4f} "
              f"({r['episodes_with_effects']}/{r['episodes']} episodes, "
              f"{r['scored_pairs']} pairs)", flush=True)

    print("\n| suite | episodes scored | mean exact EMD | mean Sinkhorn | "
          "mean rel err | p95 rel err |")
    print("|---|---|---|---|---|---|")
    for s, r in sorted(results.items()):
        print(f"| {s} | {r['episodes_with_effects']}/{r['episodes']} "
              f"| {r['mean_exact']:.2f} | {r['mean_sinkhorn']:.2f} "
              f"| {r['mean_rel_err'] * 100:.1f}% "
              f"| {r['p95_rel_err'] * 100:.1f}% |")
    print("wrote", out_path)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--runs":
        main_runs(sys.argv[2] if len(sys.argv) > 2 else "/root/runs")
    else:
        main(sys.argv[1:] or SUITES)
