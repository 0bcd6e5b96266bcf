"""Data-parallel scaling gates for the full PPO train step (VERDICT #6).

Wall-clock weak scaling cannot be measured on a CI box with one physical
core faking an 8-device mesh (time scales ~1/n by construction), so these
gates check the machine-independent facts that determine scaling on a real
slice, straight from the compiled GSPMD program:

1. per-device FLOPs stay flat from 1 to 8 devices (the sharding really
   divides the work — nothing is silently replicated or gathered),
2. the only interconnect traffic is the gradient all-reduce
   (param-sized, batch-independent); trajectory data never crosses
   devices,
3. the ICI-bound weak-scaling efficiency model at the production batch
   size clears the >= 80% target from BASELINE.md.

``scripts/scaling_report.py`` writes the full report (SCALING.json).
"""

import sys
import os

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


@pytest.fixture(scope="module")
def profiles():
    import scaling_report as sr
    from safelife_tpu.parallel.distributed import collective_stats

    out = {}
    for n in (1, 8):
        compiled, n_params = sr.build(n, envs_per_device=16)
        out[n] = collective_stats(compiled)
        out["n_params"] = n_params
    return out


def test_per_device_work_is_flat(profiles):
    f1, f8 = profiles[1]["flops"], profiles[8]["flops"]
    assert f8 == pytest.approx(f1, rel=0.10), (
        f"per-device flops changed 1->8 devices: {f1:.3e} -> {f8:.3e}; "
        "the batch sharding is not dividing the work")


def test_only_gradients_cross_devices(profiles):
    coll = profiles[8]["collective_bytes"]
    param_bytes = profiles["n_params"] * 4
    ar = coll.get("all-reduce", 0)
    assert ar > 0, "no gradient all-reduce found — params not synced?"
    assert ar <= 1.5 * param_bytes, (
        f"all-reduce moves {ar} bytes vs {param_bytes} param bytes — "
        "trajectory data is being gathered across devices")
    other = sum(v for k, v in coll.items() if k != "all-reduce")
    assert other < 100_000, (
        f"unexpected non-gradient collectives: {coll}")


def test_recurrent_only_gradients_cross_devices():
    """RecurrentPPO.train_batch is collective-free except the gradient
    all-reduce: the shard-local minibatch shuffle (whole envs per shard)
    must not gather trajectory data across devices (VERDICT r2 #4)."""
    import scaling_report as sr
    from safelife_tpu.parallel.distributed import collective_stats

    compiled, n_params = sr.build_recurrent(8, envs_per_device=16)
    stats = collective_stats(compiled)
    coll = stats["collective_bytes"]
    param_bytes = n_params * 4
    ar = coll.get("all-reduce", 0)
    assert ar > 0, "no gradient all-reduce found — params not synced?"
    assert ar <= 1.5 * param_bytes, (
        f"all-reduce moves {ar} bytes vs {param_bytes} param bytes — "
        "trajectory/carry data is being gathered across devices")
    other = sum(v for k, v in coll.items() if k != "all-reduce")
    assert other < 100_000, (
        f"unexpected non-gradient collectives: {coll}")


def test_ici_efficiency_model_clears_target(profiles):
    import scaling_report as sr
    from safelife_tpu.parallel.distributed import dp_efficiency_model
    from safelife_tpu.training.ppo import PPOConfig

    cfg = PPOConfig()
    f_fwd = sr.fwd_flops_per_obs()
    flops = sr.train_batch_flops_per_device(
        cfg, sr.PROD_ENVS_PER_DEVICE, f_fwd)
    syncs = cfg.epochs_per_batch * cfg.num_minibatches
    ar = profiles[8]["collective_bytes"].get("all-reduce", 0)
    eff = dp_efficiency_model(8, flops, syncs * ar)
    assert eff >= 0.8, (
        f"modeled weak-scaling efficiency {eff:.3f} < 0.8 at "
        f"{sr.PROD_ENVS_PER_DEVICE} envs/device")
