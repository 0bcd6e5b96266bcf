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


def scaling_report(step_fn, sizes, *, make_args, repeats=3, mode="weak"):
    """Measure wall-clock scaling of ``step_fn(*make_args(n_devices))``.

    mode="weak": work grows with ``n``; ideal time is flat, so
    ``efficiency = t_base / t_n``.
    mode="strong": work is fixed; ideal time is ``t_base * n_base / n``, so
    ``efficiency = t_base * n_base / (t_n * n)``.

    Only meaningful when the devices are real (distinct chips/cores) —
    virtual host devices multiplex one core and weak-scale at 1/n by
    construction; use :func:`collective_stats` +
    :func:`dp_efficiency_model` for a machine-independent gate there.

    Returns a list of dicts: {devices, time, efficiency}.
    """
    import time

    results = []
    for n in sizes:
        args = make_args(n)
        jax.block_until_ready(step_fn(*args))  # compile
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = jax.block_until_ready(step_fn(*args))
            best = min(best, time.perf_counter() - t0)
        del out
        results.append({"devices": n, "time": best})
    base = results[0]
    for r in results:
        if mode == "weak":
            r["efficiency"] = base["time"] / r["time"]
        else:
            r["efficiency"] = (base["time"] * base["devices"]
                               / (r["time"] * r["devices"]))
    return results


# Cross-replica ops that ride the interconnect under GSPMD.
_COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                   "collective-permute", "all-to-all")


def collective_stats(compiled):
    """Communication profile of a compiled (lowered+compiled) computation.

    Parses the optimized HLO for cross-replica collectives and returns
    {op_name: output_bytes_per_device} totals plus per-device FLOPs from
    XLA's cost analysis — the machine-independent inputs to a
    data-parallel efficiency model (wall-clock weak scaling needs real
    chips; this works anywhere, including a 1-core CI box faking an
    8-device mesh).
    """
    import re

    hlo = compiled.as_text()
    dtype_bytes = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                   "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
                   "s8": 1, "u8": 1, "pred": 1}
    totals = {}
    # e.g.:  %all-reduce.3 = f32[32,9]{1,0} all-reduce(...)
    pat = re.compile(
        r"=\s*(?:\(([^)]*)\)|(\w+)\[([\d,]*)\][^ ]*)\s+(%?)("
        + "|".join(_COLLECTIVE_OPS) + r")[.\d]*\(")
    for m in pat.finditer(hlo):
        op = m.group(5)
        if m.group(1) is not None:  # tuple-shaped collective
            elems = re.findall(r"(\w+)\[([\d,]*)\]", m.group(1))
        else:
            elems = [(m.group(2), m.group(3))]
        nbytes = 0
        for dt, dims in elems:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * dtype_bytes.get(dt, 4)
        totals[op] = totals.get(op, 0) + nbytes
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return {"collective_bytes": totals,
            "flops": float(cost.get("flops", 0.0)),
            "bytes_accessed": float(cost.get("bytes accessed", 0.0))}


def dp_efficiency_model(n_devices, flops_per_device, allreduce_bytes,
                        peak_flops=197e12, ici_bw=4.5e10, mxu_util=0.4):
    """Data-parallel weak-scaling efficiency bound from first principles.

    T_compute = flops / (peak * util); T_comm = ring all-reduce time,
    2 * (n-1)/n * bytes / ici_bw.  Efficiency = T_c / (T_c + T_comm).
    Defaults are TPU v5e: 197 TFLOP/s bf16, ~45 GB/s usable per ICI
    direction, and a conservative 40% MXU utilization for a small CNN.
    """
    if n_devices <= 1:
        return 1.0
    t_compute = flops_per_device / (peak_flops * mxu_util)
    t_comm = 2.0 * (n_devices - 1) / n_devices * allreduce_bytes / ici_bw
    return t_compute / (t_compute + t_comm)
