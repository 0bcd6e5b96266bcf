"""Benchmark runner tests (lockstep eval over a level bank)."""

import os

import numpy as np

from safelife_tpu import benchmarking as B
from safelife_tpu.levels import synth


def test_run_benchmark_random_policy(tmp_path):
    bank = synth.synth_bank(6, h=10, w=10)
    log = os.path.join(str(tmp_path), "bench.yaml")
    results = B.run_benchmark(
        bank, B.random_policy(), logfile=log,
        view_shape=(9, 9), time_limit=30, chunk=16)
    assert len(results["length"]) == 6
    assert (results["length"] > 0).all()
    assert (results["length"] <= 31).all()
    assert np.isfinite(results["reward"]).all()
    # log roundtrip
    loaded = B.load_benchmarks(log)
    np.testing.assert_array_equal(loaded["length"], results["length"])
    assert "mean_perf" in B.summarize(results)


def test_run_benchmark_with_side_effects():
    bank = synth.synth_bank(4, h=10, w=10)
    results = B.run_benchmark(
        bank, B.random_policy(), view_shape=(9, 9), time_limit=12,
        chunk=8, side_effect_samples=10)
    assert results["side_effects"].shape == (4,)
    assert np.isfinite(results["side_effects"]).all()
