"""Worker process for tests/test_multiprocess.py.

Runs one rank of a 2-process CPU (gloo) data-parallel training job through
the REAL multi-host code path: ``parallel.distributed.initialize`` (driven
by the SAFELIFE_* environment variables, as a pod launcher would set them),
the global (data, model) mesh, and a full ``Trainer.train`` over it.
Prints one ``RESULT {json}`` line for the parent to compare across ranks.

Reference contrast: the original has no distributed backend at all — its
multi-machine story is gcloud scripts launching independent jobs
(`/root/reference/gcloud/start-remote-job:40-80`); this exercises the
jax.distributed/DCN equivalent end to end on CPU (SURVEY.md §4(d)).
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_compilation_cache_dir", "/tmp/safelife_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402

from safelife_tpu.parallel import distributed  # noqa: E402


def main():
    assert distributed.initialize(), "SAFELIFE_* env vars must be set"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert jax.local_device_count() == 1

    from safelife_tpu.levels import synth
    from safelife_tpu.training.driver import Trainer, TrainerConfig
    from safelife_tpu.training.ppo import PPOConfig

    mesh = distributed.make_global_mesh()
    assert mesh.devices.size == 2

    bank = synth.synth_bank(4, h=13, w=13)
    tc = TrainerConfig(num_envs=8, view_shape=(17, 17), time_limit=20,
                       report_every=10**9, save_every=10**9, seed=3)
    pc = PPOConfig(steps_per_env=4, num_minibatches=2, epochs_per_batch=1)
    with mesh:
        tr = Trainer(tc, pc, bank=bank, mesh=mesh)
        tr.train(total_steps=128)

        # Wall-clock of one more jitted train_batch (both ranks multiplex
        # one physical core here, so this is a mechanism check + a crude
        # upper bound, not a scaling measurement).
        import time
        t0 = time.perf_counter()
        tr.train(total_steps=tr.global_step() + 32)
        dt = time.perf_counter() - t0

    # Params are replicated: each rank reads its addressable shard.
    leaves = jax.tree.leaves(tr.train_state.params["net"])
    checksum = 0.0
    for leaf in leaves:
        arr = np.asarray(leaf.addressable_data(0))
        checksum += float(np.abs(arr.astype(np.float64)).sum())
    out = {
        "pid": jax.process_index(),
        "steps": int(tr.global_step()),
        "param_checksum": round(checksum, 6),
        "train_batch_seconds": dt,
    }
    print("RESULT " + json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
