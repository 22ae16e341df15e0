"""Micro-cost of individual vocoder ops per stage shape (chained timing).

For each stage's (C, T): one dilated conv (k=11,d=5), one small conv
(k=3,d=1), one aa-snake activation, plus a 'stage6-convs-only' chain.

Run in the foreground:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/micro_vocoder_ops.py
"""

import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from voice_tts_tpu.ops import aa_snake_activation  # noqa: E402


def chained_ms(run, args, lo=8, hi=24, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(x, n):
        def body(i, acc):
            return acc + run(x + acc * 1e-9 + i * 1e-9, *args)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    x = args[0]
    args = args[1:]
    float(loop(x, lo))
    float(loop(x, hi))

    def t(n, s):
        t0 = time.perf_counter()
        float(loop(x + s * 1e-6, n))
        return time.perf_counter() - t0

    tlo = min(t(lo, 1 + i) for i in range(reps))
    thi = min(t(hi, 10 + i) for i in range(reps))
    return (thi - tlo) / (hi - lo) * 1e3


def conv(x, w, d):
    pad = (w.shape[-1] * d - d) // 2
    return jax.lax.conv_general_dilated(
        x, w, (1,), [(pad, pad)], rhs_dilation=(d,),
        dimension_numbers=("NCH", "OIH", "NCH"))


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    shapes = [(768, 1792), (384, 7168), (192, 14336), (96, 28672),
              (48, 57344), (24, 114688)]
    for c, t in shapes:
        x = jax.random.normal(key, (1, c, t), jnp.float32) * 0.1
        w11 = jax.random.normal(key, (c, c, 11), jnp.float32) * 0.01
        w3 = jax.random.normal(key, (c, c, 3), jnp.float32) * 0.01
        a = jnp.ones((c,)) * 0.5
        br = jnp.ones((c,))

        ms_c11 = chained_ms(
            lambda x, w: jnp.sum(conv(x, w, 5)) * 1e-6, (x, w11))
        ms_c3 = chained_ms(
            lambda x, w: jnp.sum(conv(x, w, 1)) * 1e-6, (x, w3))
        ms_act = chained_ms(
            lambda x, a, br: jnp.sum(aa_snake_activation(x, a, br)) * 1e-6,
            (x, a, br))
        print(f"C={c:4d} T={t:6d}: conv11d5 {ms_c11:6.3f}  conv3d1 {ms_c3:6.3f}"
              f"  aa_act {ms_act:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
