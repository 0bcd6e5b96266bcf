"""Micro-experiments for the obs path (run on TPU when the chip is free):

a) barrel roll (per-lane recentering) on int32 vs uint16 blocks — u16
   packs 2 elements per VPU lane IF Mosaic legalizes the rolls/selects;
b) in-kernel (vh*vw, L) transpose cost (historical: the obs_transposed
   flag — it never compiled on the real chip's Mosaic and was removed);
c) 3x3 torus neighbor-sum stencil at i32 vs u16 vs u8 element width —
   does narrow arithmetic raise element density per VPU pass, and does
   4 x u8 planes beat 1 x packed-i32 (field extraction for free)?
d) end-to-end step with the single-kernel merged step
   (historical: the merged single-kernel step lost on chip and was
   removed 2026-08-19).
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safelife_tpu.env.env import BatchedSafeLifeEnv, EnvConfig
from safelife_tpu.levels import loader, synth

B = 16384
STEPS = 64
H = W = 26
VH = VW = 15
LANES = 128


def timeit(name, fn, *args):
    # flush per line: the pipeline runs this under a hard `timeout`, and
    # block-buffered output would vanish if the run is cut short.
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:
        print(f"{name:42s} FAILED: {str(e)[:100]}", flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:42s} {best/STEPS*1e6:9.1f} us/step", flush=True)
    return out


def _roll_back(x, amount, axis):
    n = x.shape[axis]
    return pltpu.roll(x, n - amount % n, axis)


def make_roll_kernel(dtype):
    def kernel(si_ref, x_ref, out_ref):
        x = x_ref[:].astype(dtype)
        rs = si_ref[0, :]
        cs = si_ref[1, :]
        for k in range((H - 1).bit_length()):
            bit = ((rs >> k) & 1)[None, None, :] != 0
            x = jnp.where(bit, _roll_back(x, 1 << k, 0), x)
        x = x[:VH]
        for k in range((W - 1).bit_length()):
            bit = ((cs >> k) & 1)[None, None, :] != 0
            x = jnp.where(bit, _roll_back(x, 1 << k, 1), x)
        out_ref[:] = x[:, :VW].astype(jnp.uint16)

    @jax.jit
    def run(x, si):
        spec_in = pl.BlockSpec((H, W, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((VH, VW, LANES), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
        lane = pl.BlockSpec((2, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

        def body(x, _):
            v = pl.pallas_call(
                kernel, grid=(B // LANES,),
                in_specs=[lane, spec_in],
                out_specs=spec_out,
                out_shape=jax.ShapeDtypeStruct((VH, VW, B), jnp.uint16),
            )(si, x)
            return x + v.sum(axis=(0, 1)).astype(jnp.uint16)[None, None, :], 0
        x, _ = jax.lax.scan(body, x, length=STEPS)
        return x
    return run


def make_transpose_kernel(dtype):
    def kernel(x_ref, out_ref):
        x = x_ref[:].astype(dtype)
        vt = x.reshape(VH * VW, LANES).T
        out_ref[:] = vt.reshape(LANES, VH, VW).astype(jnp.uint16)

    @jax.jit
    def run(x):
        spec_in = pl.BlockSpec((VH, VW, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((LANES, VH, VW), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)

        def body(x, _):
            v = pl.pallas_call(
                kernel, grid=(B // LANES,),
                in_specs=[spec_in],
                out_specs=spec_out,
                out_shape=jax.ShapeDtypeStruct((B, VH, VW), jnp.uint16),
            )(x)
            return x + v.sum(axis=(1, 2)).astype(jnp.uint16)[None, None, :], 0
        x, _ = jax.lax.scan(body, x, length=STEPS)
        return x
    return run


def make_nbsum_kernel(dtype, planes=1):
    """3x3 torus neighbor sum (the CA advance's count stencil: 4 rolls +
    4 adds) over ``planes`` separate arrays of the given element width."""
    def kernel(x_ref, out_ref):
        acc = None
        for p in range(planes):
            x = x_ref[:].astype(dtype) + jnp.asarray(p, dtype)
            r = x + pltpu.roll(x, 1, 1) + pltpu.roll(x, W - 1, 1)
            s = r + pltpu.roll(r, 1, 0) + pltpu.roll(r, H - 1, 0)
            acc = s if acc is None else acc + s
        out_ref[:] = acc.astype(jnp.uint16)

    @jax.jit
    def run(x):
        spec = pl.BlockSpec((H, W, LANES), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

        def body(x, _):
            v = pl.pallas_call(
                kernel, grid=(B // LANES,),
                in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((H, W, B), jnp.uint16),
            )(x)
            return v, 0
        x, _ = jax.lax.scan(body, x, length=STEPS)
        return x
    return run


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (H, W, B), 0, 2**15).astype(jnp.uint16)
    si = jax.random.randint(key, (2, B), 0, H).astype(jnp.int32)
    timeit("barrel roll i32", make_roll_kernel(jnp.int32), x, si)
    timeit("barrel roll u16", make_roll_kernel(jnp.uint16), x, si)

    xs = (x & 15).astype(jnp.uint16)  # small values: no u8 overflow
    timeit("nb_sum i32 x1", make_nbsum_kernel(jnp.int32), xs)
    timeit("nb_sum i32 x4", make_nbsum_kernel(jnp.int32, planes=4), xs)
    timeit("nb_sum u16 x1", make_nbsum_kernel(jnp.uint16), xs)
    timeit("nb_sum u8  x1", make_nbsum_kernel(jnp.uint8), xs)
    timeit("nb_sum u8  x4", make_nbsum_kernel(jnp.uint8, planes=4), xs)

    v = jax.random.randint(key, (VH, VW, B), 0, 2**15).astype(jnp.uint16)
    timeit("in-kernel transpose i32", make_transpose_kernel(jnp.int32), v)
    timeit("in-kernel transpose u16", make_transpose_kernel(jnp.uint16), v)

    # XLA-side transpose for comparison.
    @jax.jit
    def xla_transpose(v):
        def body(v, _):
            t = jnp.transpose(v, (2, 0, 1))
            return v + t.sum(axis=(1, 2)).astype(jnp.uint16)[None, None, :], 0
        v, _ = jax.lax.scan(body, v, length=STEPS)
        return v
    timeit("XLA transpose (15,15,B)->(B,15,15)", xla_transpose, v)

    # end-to-end step with the flag
    try:
        bank = loader.load_bank("benchmarks/v1.0/append-still.npz")
    except Exception:
        bank = synth.synth_bank(64)
    for name, cfg in [
        ("step obs default", EnvConfig(view_shape=(15, 15))),
    ]:
        env = BatchedSafeLifeEnv(cfg)
        key = jax.random.PRNGKey(0)
        state = env.reset_all(bank, B, key)

        @jax.jit
        def run(state, key, env=env):
            def outer(carry, _):
                state, key = carry
                key, kf = jax.random.split(key)
                fresh = env.sample_fresh_levels(bank, B, kf)

                def body(carry, _):
                    state, key = carry
                    key, ka, ke = jax.random.split(key, 3)
                    a = jax.random.randint(ka, (B,), 0, 9)
                    state, ts = env.step(state, bank, a, ke,
                                         fresh_levels=fresh)
                    return (state, key), \
                        ts.obs.astype(jnp.int32).sum() + ts.reward.sum()
                (state, key), r = jax.lax.scan(body, (state, key), length=16)
                return (state, key), r.sum()
            (state, key), r = jax.lax.scan(outer, (state, key),
                                           length=STEPS // 16)
            return state, r.sum()
        timeit(name, run, state, key)


if __name__ == "__main__":
    main()
