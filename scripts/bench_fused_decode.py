"""Hardware check + microbenchmark for the fused decode-step megakernel.

Correctness: compares against a straight-jnp trunk built from the same packed
int8 tiles.  Timing: per-token latency of the megakernel vs the equivalent
XLA trunk at flagship shape (L=24, D=1280, H=20).

Run in the foreground on the TPU host:  python scripts/bench_fused_decode.py
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from voice_tts_tpu.ops.fused_decode import (BLOCK_T, FusedDecodePack,
                                            apply_kv_update,
                                            fused_decode_step)


def make_pack(key, l, d):
    ks = jax.random.split(key, 4)
    w = jax.random.randint(ks[0], (l, 12, d, d), -127, 128, dtype=jnp.int8)
    # gentle scales: keep the residual stream O(1) like a trained model so
    # bf16 rounding doesn't compound into large relative error over 24 layers
    scale = jax.random.uniform(ks[1], (l, 12, d), jnp.float32,
                               2e-4, 5e-4)
    bias = jax.random.normal(ks[2], (l, 12, d), jnp.float32) * 0.02
    ln = jnp.concatenate([
        jnp.ones((l, 1, d), jnp.float32),
        jnp.zeros((l, 1, d), jnp.float32),
        jnp.ones((l, 1, d), jnp.float32),
        jnp.zeros((l, 1, d), jnp.float32)], axis=1)
    ln = ln + jax.random.normal(ks[3], (l, 4, d), jnp.float32) * 0.02
    return FusedDecodePack(w, jnp.concatenate([scale, bias, ln], axis=1))


def ref_trunk(x, pack, cache, bias, pos, heads):
    """Plain-jnp reference of the fused kernel's math (time-major cache)."""
    l, _, _, t_max, d = cache.shape
    hd = d // heads

    def ln_f(x, w, b):
        m = jnp.mean(x, -1, keepdims=True)
        v = jnp.mean((x - m) ** 2, -1, keepdims=True)
        return (x - m) * jax.lax.rsqrt(v + 1e-5) * w + b

    def deq(i, t):
        return (pack.w[i, t].astype(jnp.bfloat16), pack.consts[i, t:t + 1],
                pack.consts[i, t + 12:t + 13])

    def proj(h, i, t0, n):
        outs = []
        for t in range(t0, t0 + n):
            w, s, b = deq(i, t)
            outs.append(jnp.dot(h.astype(jnp.bfloat16), w,
                                preferred_element_type=jnp.float32) * s + b)
        return jnp.concatenate(outs, axis=-1)

    x = x.astype(jnp.float32)
    for i in range(l):
        h = ln_f(x, pack.consts[i, 24], pack.consts[i, 25])
        q = proj(h, i, 0, 1)
        k = proj(h, i, 1, 1)
        v = proj(h, i, 2, 1)
        cache = cache.at[i, 0, 0, pos, :].set(k[0].astype(cache.dtype))
        cache = cache.at[i, 1, 0, pos, :].set(v[0].astype(cache.dtype))
        ks = cache[i, 0, 0].astype(jnp.float32)    # (Tmax, D)
        vs = cache[i, 1, 0].astype(jnp.float32)
        qh = q.reshape(heads, hd) * hd ** -0.5
        kh = ks.reshape(t_max, heads, hd)
        scores = jnp.einsum("hd,thd->ht", qh, kh) + bias[None, :, 0]
        tpos = jnp.arange(t_max)
        scores = jnp.where((tpos <= pos)[None, :], scores, -jnp.inf)
        p = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("ht,thd->hd", p, vs.reshape(t_max, heads, hd))
        x = x + proj(ctx.reshape(1, d), i, 3, 1)
        h = ln_f(x, pack.consts[i, 26], pack.consts[i, 27])
        up = jax.nn.gelu(proj(h, i, 4, 4), approximate=True)  # (1, 4D)
        down = 0.0
        for j in range(4):
            w, s, b = deq(i, 8 + j)
            down = down + (jnp.dot(up[:, j * d:(j + 1) * d].astype(jnp.bfloat16),
                                   w, preferred_element_type=jnp.float32)
                           * s + b)
        x = x + down
    return x, cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--dim", type=int, default=1280)
    ap.add_argument("--heads", type=int, default=20)
    ap.add_argument("--tmax", type=int, default=512)
    ap.add_argument("--pos", type=int, default=300)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--skip-check", action="store_true")
    ap.add_argument("--skip-attn", action="store_true",
                    help="stub out attention (perf isolation)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    l, d, h, t_max = args.layers, args.dim, args.heads, args.tmax
    interp = jax.default_backend() != "tpu"
    print("backend:", jax.default_backend())

    key = jax.random.PRNGKey(0)
    pack = make_pack(key, l, d)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, d), jnp.float32)
    cache = (jax.random.normal(jax.random.PRNGKey(2), (l, 2, 1, t_max, d),
                               jnp.float32) * 0.3).astype(jnp.bfloat16)
    # zero out future positions like a real prefilled cache
    tpos = jnp.arange(t_max)
    cache = jnp.where((tpos >= args.pos)[None, None, None, :, None], 0, cache)
    bias = jnp.where((tpos < 8)[:, None], -1e30, 0.0).astype(jnp.float32)
    pos = jnp.asarray(args.pos, jnp.int32)

    if not args.skip_check:
        y, kv_new = fused_decode_step(x, pack, cache, bias, pos, h,
                                      interpret=interp)
        y_ref, cache_r = jax.jit(functools.partial(ref_trunk, heads=h))(
            x, pack, cache, bias, pos)
        y, y_ref = np.asarray(y), np.asarray(y_ref)
        err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
        print(f"rel err hidden: {err:.2e}")
        ck = np.asarray(kv_new, np.float32)
        cr = np.asarray(cache_r[:, :, 0, args.pos, :], np.float32)
        cerr = np.abs(ck - cr).max() / (np.abs(cr).max() + 1e-9)
        print(f"rel err kv col: {cerr:.2e}")
        assert err < 2e-2 and cerr < 2e-2, "MISMATCH"
        print("correctness OK")

    # timing: chain steps so they can't overlap dispatch
    @functools.partial(jax.jit, static_argnames=("iters",))
    def many(x, cache, pack, bias, pos, iters):
        def body(i, carry):
            x, cache = carry
            y, kv_new = fused_decode_step(x, pack, cache, bias, pos, h,
                                          skip_attn=args.skip_attn)
            cache = apply_kv_update(cache, kv_new, pos)
            return (y * 1e-3 + x, cache)
        x, cache = jax.lax.fori_loop(0, iters, body, (x, cache))
        return jnp.sum(x)

    def timed(iters, seed):
        t0 = time.perf_counter()
        float(many(x + seed, cache, pack, bias, pos, iters))
        return time.perf_counter() - t0

    lo, hi = max(args.iters // 4, 1), args.iters
    timed(lo, 0.0)  # compile
    timed(hi, 0.0)  # compile
    t_lo = [timed(lo, 1.0 + i) for i in range(3)]
    t_hi = [timed(hi, 4.0 + i) for i in range(3)]
    print("raw lo:", [f"{t*1e3:.1f}" for t in t_lo],
          "hi:", [f"{t*1e3:.1f}" for t in t_hi], "ms")
    dt = (min(t_hi) - min(t_lo)) / (hi - lo)
    print(f"fused: {dt * 1e3:.3f} ms/token "
          f"(iters {lo}/{hi}, pos={args.pos}, skip_attn={args.skip_attn})")


if __name__ == "__main__":
    main()
