"""Micro-benchmark: per-tile cost of the fused-decode weight pipeline.

Streams L*12 int8 (D, D) tiles through VMEM like the megakernel, with the
compute stage varied: none (pure DMA), convert-only, dot from (1, D) rows,
dot from (8, D) rows, int8 dot.  Every mode's output depends on the
loop-carried x so XLA cannot hoist the call; per-pass time comes from the
difference of two iteration counts (cancels dispatch overhead).
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(mode):
    def kernel(x_ref, w_ref, o_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = x_ref[...]

        if mode == "dma":
            acc[...] = acc[...] + w_ref[0, :8, :].astype(jnp.float32)
        elif mode == "convert":
            w = w_ref[0].astype(jnp.bfloat16)
            acc[...] = acc[...] + w[:8, :].astype(jnp.float32)
        elif mode in ("dot1", "dot8"):
            n = 1 if mode == "dot1" else 8
            y = jnp.dot(x_ref[:n, :].astype(jnp.bfloat16),
                        w_ref[0].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            acc[:n, :] = acc[:n, :] + y
        elif mode == "dot8i":
            y = jnp.dot(x_ref[...].astype(jnp.int8), w_ref[0],
                        preferred_element_type=jnp.int32)
            acc[...] = acc[...] + y.astype(jnp.float32)

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = acc[...]
    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "iters"))
def run(x, w, mode, iters):
    n_tiles, d, _ = w.shape

    def one(_, x):
        out = pl.pallas_call(
            make_kernel(mode),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((8, d), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, d), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, d), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, d), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, d), jnp.float32)],
        )(x, w)
        return x * 0.5 + out * 1e-6
    return jax.lax.fori_loop(0, iters, one, x)


def timed(x, w, mode, iters):
    float(jnp.sum(run(x, w, mode, iters)))       # warm-up + full execution
    t0 = time.perf_counter()
    float(jnp.sum(run(x + 1.0, w, mode, iters)))  # host pull = hard barrier
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1280)
    ap.add_argument("--tiles", type=int, default=288)
    ap.add_argument("--lo", type=int, default=20)
    ap.add_argument("--hi", type=int, default=60)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    d = args.dim
    w = jax.random.randint(jax.random.PRNGKey(0), (args.tiles, d, d),
                           -127, 128, dtype=jnp.int8)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, d), jnp.float32)

    for mode in ("dma", "convert", "dot1", "dot8", "dot8i"):
        t_lo = timed(x, w, mode, args.lo)
        t_hi = timed(x, w, mode, args.hi)
        dt = (t_hi - t_lo) / (args.hi - args.lo)
        per_tile = dt / args.tiles * 1e6
        gbps = w.size / dt / 1e9
        print(f"{mode:8s}: {dt * 1e3:7.3f} ms/pass  {per_tile:6.2f} us/tile  "
              f"{gbps:6.1f} GB/s")


if __name__ == "__main__":
    main()
