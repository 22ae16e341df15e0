"""Micro-benchmark: int4 tile unpack + dot strategies for the decode megakernel.

The int8 megakernel streams (D, D) tiles at the DMA floor (~2 us/tile at
D=1280).  int4 halves the bytes (~1 us/tile DMA) but the in-kernel unpack +
per-group dequant dots cost VPU/MXU time; measured r1: only 1.33x vs int8.
This bench isolates the per-tile cost of each candidate strategy:

  dma     pure int4-tile streaming (the floor)
  cur     current ops/fused_decode.py scheme: i32 unpack, per-group (K=128)
          sub-dots scaled on the output
  i8sh    int8-dtype shift unpack (lo = (w<<4)>>4, hi = w>>4), same sub-dots
  g2      2 scale groups per half (K=320 sub-dots)
  dense   per-channel scale only (2 dots, K=D/2): structure floor, no groups
  xscale  fold group scales into the ACTIVATIONS: y = sum_g (x_g * ??) -- not
          expressible exactly; skipped (scales vary per output channel)
  expand  dequant whole tile to bf16 via an MXU-expanded (rows, out) scale
          matrix, then 2 dense dots

Run foreground on the TPU host:
    cd /root/repo && timeout 1500 python scripts/micro_int4.py
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128


def make_kernel(mode, d, per_half):
    half = d // 2
    gsize = half // per_half

    def kernel(x_ref, w_ref, gs_ref, o_ref, acc):
        t = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            acc[...] = x_ref[...]

        x = acc[0:1, :]  # loop-carried dependence: no hoisting possible

        if mode == "dma":
            y = w_ref[0, :1, :].astype(jnp.float32)
        elif mode in ("cur", "g2", "i8sh"):
            nph = 2 if mode == "g2" else per_half
            gsz = half // nph
            if mode == "i8sh":
                w8 = w_ref[0]
                lo = jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(w8, 4), 4).astype(jnp.bfloat16)
                hi = jax.lax.shift_right_arithmetic(w8, 4).astype(jnp.bfloat16)
            else:
                wb = w_ref[0].astype(jnp.int32)
                lo = (((wb & 15) ^ 8) - 8).astype(jnp.bfloat16)
                hi = jax.lax.shift_right_arithmetic(wb, 4).astype(jnp.bfloat16)
            xb = x.astype(jnp.bfloat16)
            y = jnp.zeros((1, d), jnp.float32)
            for g in range(nph):
                sl = slice(g * gsz, (g + 1) * gsz)
                i0 = g * (per_half // nph)
                y += (jnp.dot(xb[:, g * gsz:(g + 1) * gsz], lo[sl],
                              preferred_element_type=jnp.float32)
                      * gs_ref[i0:i0 + 1, :])
                y += (jnp.dot(xb[:, half + g * gsz:half + (g + 1) * gsz],
                              hi[sl], preferred_element_type=jnp.float32)
                      * gs_ref[per_half + i0:per_half + i0 + 1, :])
        elif mode == "dense":
            wb = w_ref[0].astype(jnp.int32)
            lo = (((wb & 15) ^ 8) - 8).astype(jnp.bfloat16)
            hi = jax.lax.shift_right_arithmetic(wb, 4).astype(jnp.bfloat16)
            xb = x.astype(jnp.bfloat16)
            y = (jnp.dot(xb[:, :half], lo,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(xb[:, half:], hi,
                           preferred_element_type=jnp.float32))
            y = y * gs_ref[0:1, :]
        elif mode in ("expand", "xp8"):
            if mode == "xp8":
                w8 = w_ref[0]
                lo = jax.lax.shift_right_arithmetic(
                    jax.lax.shift_left(w8, 4), 4).astype(jnp.float32)
                hi = jax.lax.shift_right_arithmetic(w8, 4).astype(jnp.float32)
            else:
                wb = w_ref[0].astype(jnp.int32)
                lo = (((wb & 15) ^ 8) - 8).astype(jnp.float32)
                hi = jax.lax.shift_right_arithmetic(wb, 4).astype(jnp.float32)
            # expansion matrix (half, per_half) 0/1: row r -> group r//gsize
            rows = jax.lax.broadcasted_iota(jnp.int32, (half, per_half), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (half, per_half), 1)
            e = (rows // gsize == cols).astype(jnp.float32)
            slo = jnp.dot(e, gs_ref[:per_half, :],
                          preferred_element_type=jnp.float32)
            shi = jnp.dot(e, gs_ref[per_half:, :],
                          preferred_element_type=jnp.float32)
            xb = x.astype(jnp.bfloat16)
            y = (jnp.dot(xb[:, :half], (lo * slo).astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
                 + jnp.dot(xb[:, half:], (hi * shi).astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32))
        else:
            raise ValueError(mode)

        acc[0:1, :] = acc[0:1, :] * 0.5 + y * 1e-6

        @pl.when(t == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = acc[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "iters", "per_half"))
def run(x, w, gs, mode, iters, per_half):
    n_tiles, half, d = w.shape

    def one(_, x):
        out = pl.pallas_call(
            make_kernel(mode, d, per_half),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((8, d), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, half, d), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * per_half, d), lambda t: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, d), lambda t: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, d), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8, d), jnp.float32)],
        )(x, w, gs)
        return x * 0.5 + out * 1e-6
    return jax.lax.fori_loop(0, iters, one, x)


def timed(x, w, gs, mode, iters, per_half):
    float(jnp.sum(run(x, w, gs, mode, iters, per_half)))
    t0 = time.perf_counter()
    float(jnp.sum(run(x + 1.0, w, gs, mode, iters, per_half)))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=1280)
    ap.add_argument("--tiles", type=int, default=288)
    ap.add_argument("--lo", type=int, default=20)
    ap.add_argument("--hi", type=int, default=60)
    ap.add_argument("--modes", default="dma,cur,i8sh,g2,dense,expand,xp8")
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    d = args.dim
    per_half = (d // 2) // min(GROUP, d // 2)
    w = jax.random.randint(jax.random.PRNGKey(0), (args.tiles, d // 2, d),
                           -127, 128, dtype=jnp.int8)
    gs = jax.random.uniform(jax.random.PRNGKey(2), (2 * per_half, d),
                            jnp.float32, 1e-4, 5e-4)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, d), jnp.float32)

    for mode in args.modes.split(","):
        t_lo = timed(x, w, gs, mode, args.lo, per_half)
        t_hi = timed(x, w, gs, mode, args.hi, per_half)
        dt = (t_hi - t_lo) / (args.hi - args.lo)
        per_tile = dt / args.tiles * 1e6
        gbps = w.size / dt / 1e9
        print(f"{mode:8s}: {dt * 1e3:7.3f} ms/pass  {per_tile:6.2f} us/tile  "
              f"{gbps:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
