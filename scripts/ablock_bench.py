"""Block-width sweep for the ACTION kernel alone (run on TPU).

The advance kernel pins 128 lanes (many streams want fine double
buffering); the action kernel is stream-light, so wider blocks may
amortize per-block overhead better.
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from safelife_tpu.levels import loader, synth
from safelife_tpu.ops import env_step_pallas as esp

B = 16384
STEPS = 64


def main():
    try:
        bank = loader.load_bank("benchmarks/v1.0/append-still.npz")
    except Exception:
        bank = synth.synth_bank(64)
    lv = bank.take(jnp.arange(B) % bank.num_levels)
    board = lv.board
    h, w, _ = board.shape
    si = jnp.zeros((9, B), jnp.int32).at[0].set(2)

    for block in (128, 256, 512, 1024, 2048):
        grid = (B // block,)
        board_spec = pl.BlockSpec((h, w, block), lambda i: (0, 0, i),
                                  memory_space=pltpu.VMEM)
        lane_spec = lambda rows: pl.BlockSpec(  # noqa: E731
            (rows, block), lambda i: (0, i), memory_space=pltpu.VMEM)
        bshape = jax.ShapeDtypeStruct((h, w, B), jnp.uint16)

        @jax.jit
        def action_only(board):
            def body(b, _):
                b2, act_i = pl.pallas_call(
                    esp._action_kernel,
                    grid=grid,
                    in_specs=[lane_spec(9), board_spec],
                    out_specs=(board_spec, lane_spec(4)),
                    out_shape=(bshape,
                               jax.ShapeDtypeStruct((4, B), jnp.int32)),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(si, b)
                return b2, act_i[0].sum()
            b, outs = jax.lax.scan(body, board, length=STEPS)
            return b, outs.sum()

        try:
            out = jax.block_until_ready(action_only(board))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = jax.block_until_ready(action_only(board))
                best = min(best, time.perf_counter() - t0)
            print(f"block={block:5d}  {best/STEPS*1e6:9.1f} us/step")
        except Exception as e:
            print(f"block={block:5d}  FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
