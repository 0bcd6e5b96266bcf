"""Multi-host runtime: process initialization + data-parallel scale-out.

The reference has no distributed backend (its "distribution" is gcloud
scripts launching independent jobs — SURVEY.md §2.3); here scale-out is a
first-class component:

* :func:`initialize` wraps ``jax.distributed.initialize`` for multi-host
  pods (DCN coordination; ICI collectives inside each slice).
* :func:`make_global_mesh` builds the (data, model) mesh over all devices
  of all processes.
* The Trainer accepts a ``mesh``: env state shards over 'data' (boards are
  per-device — zero cross-device traffic during rollout), params/opt state
  replicate, and the gradient all-reduce is the psum XLA inserts under
  GSPMD.  Level banks replicate per host.

Environment-variable driven setup (for pod launchers)::

    SAFELIFE_COORDINATOR  host:port of process 0
    SAFELIFE_NUM_PROCS    total process count
    SAFELIFE_PROC_ID      this process's id
"""

import logging
import os

import jax

from . import mesh as pmesh

logger = logging.getLogger(__name__)


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               **kwargs):
    """Initialize the multi-host runtime (no-op for single-process runs).

    Arguments default to the SAFELIFE_* environment variables; when none
    are present this is a no-op and JAX runs single-process.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "SAFELIFE_COORDINATOR")
    if coordinator_address is None:
        return False
    num_processes = int(num_processes or os.environ["SAFELIFE_NUM_PROCS"])
    process_id = int(process_id if process_id is not None
                     else os.environ["SAFELIFE_PROC_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id, **kwargs)
    logger.info("distributed runtime up: process %d/%d, %d local + %d "
                "global devices", process_id, num_processes,
                jax.local_device_count(), jax.device_count())
    return True


def make_global_mesh(n_model=1):
    """(data, model) mesh over every device of every process."""
    return pmesh.make_mesh(n_model=n_model, devices=jax.devices())


def scaling_report(step_fn, sizes, *, make_args, repeats=3):
    """Measure throughput of ``step_fn(*make_args(n_devices))`` over device
    counts and report scaling efficiency vs the smallest size.

    Returns a list of dicts: {devices, steps_per_sec, efficiency}.
    """
    import time

    results = []
    for n in sizes:
        args = make_args(n)
        out = jax.block_until_ready(step_fn(*args))  # compile
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = jax.block_until_ready(step_fn(*args))
            best = min(best, time.perf_counter() - t0)
        results.append({"devices": n, "time": best})
    base = results[0]
    for r in results:
        speedup = base["time"] / r["time"] * (r["devices"] / base["devices"])
        # ideal: time constant as devices scale with work (weak scaling)
        r["efficiency"] = base["time"] / r["time"]
    return results
