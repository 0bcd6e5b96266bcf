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


def _time_allreduce(mesh, n_floats, iters=8):
    """Measured wall-clock of one gradient-sized all-reduce over the mesh.

    Chained (each call consumes the previous result) so calls cannot
    overlap; the mean over ``iters`` is the T_allreduce input to the
    ``dp_efficiency_model`` cross-check.
    """
    import time

    import jax.numpy as jnp
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape["data"]

    @jax.jit
    def ar(x):
        # Replicated-in, replicated-out psum along 'data' — the same
        # collective GSPMD inserts for the gradient all-reduce (each rank
        # holds a full gradient copy; the sum crosses the processes).
        f = shard_map(lambda v: jax.lax.psum(v, "data"), mesh=mesh,
                      in_specs=P(), out_specs=P())
        return f(x) / n

    x = jax.device_put(jnp.ones(n_floats, jnp.float32),
                       NamedSharding(mesh, P()))
    x = jax.block_until_ready(ar(x))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        x = ar(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def main():
    single = os.environ.get("SAFELIFE_SINGLE") == "1"
    if single:
        # 1-process baseline for the wall-clock cross-check: identical
        # config on one device, no distributed runtime.
        assert not distributed.initialize()
        assert jax.device_count() == 1
    else:
        assert distributed.initialize(), "SAFELIFE_* env vars must be set"
        assert jax.process_count() == 2, jax.process_count()
        assert jax.device_count() == 2, jax.device_count()
        assert jax.local_device_count() == 1

    from safelife_tpu.levels import synth
    from safelife_tpu.training.driver import Trainer, TrainerConfig
    from safelife_tpu.training.ppo import PPOConfig

    mesh = distributed.make_global_mesh()
    assert mesh.devices.size == (1 if single else 2)

    bank = synth.synth_bank(4, h=13, w=13)
    # Per-RANK env count is fixed (weak scaling): the 2-process run
    # doubles the global batch, the 1-process baseline keeps one shard.
    num_envs = 4 if single else 8
    tc = TrainerConfig(num_envs=num_envs, view_shape=(17, 17),
                       time_limit=20, report_every=10**9, save_every=10**9,
                       seed=3)
    pc = PPOConfig(steps_per_env=4, num_minibatches=2, epochs_per_batch=1)
    batch_steps = num_envs * pc.steps_per_env
    with mesh:
        tr = Trainer(tc, pc, bank=bank, mesh=mesh)
        tr.train(total_steps=8 * batch_steps)

        # Wall-clock of four more jitted train_batches.  Both ranks
        # multiplex ONE physical core here, so per-step compute time in
        # the 2-process run is ~2x the 1-process baseline by construction;
        # the cross-process overhead on top of that serialization is what
        # the dp_efficiency_model cross-check in test_multiprocess.py
        # bounds with the measured all-reduce time below.
        import time
        t0 = time.perf_counter()
        tr.train(total_steps=tr.global_step() + 4 * batch_steps)
        dt = (time.perf_counter() - t0) / 4.0

        n_params = sum(x.size for x in
                       jax.tree.leaves(tr.train_state.params["net"]))
        t_ar = _time_allreduce(mesh, n_params)
        t_ar8 = _time_allreduce(mesh, 8 * n_params)

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
        "allreduce_seconds": t_ar,
        "allreduce8_seconds": t_ar8,
        "n_params": int(n_params),
    }
    print("RESULT " + json.dumps(out))
    sys.stdout.flush()


if __name__ == "__main__":
    main()
