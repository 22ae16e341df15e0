"""A/B: packed grouped-conv BigVGAN vs module path at bench shape.

Chained fori_loop difference timing (axon-honest).  Run in the foreground:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_packed_vocoder.py
"""

import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from voice_tts_tpu.config import TTSConfig  # noqa: E402
from voice_tts_tpu.models.vocoder import BigVGAN  # noqa: E402
from voice_tts_tpu.models.vocoder.packed import (  # noqa: E402
    bigvgan_packed_apply, pack_bigvgan)


def chained_ms(run, p, mel, lo=4, hi=12, reps=3):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(p, m, n):
        def body(i, acc):
            return acc + run(p, m + acc * 1e-9 + i * 1e-9)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(loop(p, mel, lo))
    float(loop(p, mel, hi))

    def t(n, s):
        t0 = time.perf_counter()
        float(loop(p, mel + s * 1e-6, n))
        return time.perf_counter() - t0

    tlo = min(t(lo, 1 + i) for i in range(reps))
    thi = min(t(hi, 10 + i) for i in range(reps))
    return (thi - tlo) / (hi - lo) * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = TTSConfig().vocoder
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.num_mels, 448),
                            jnp.float32)
    model = BigVGAN(cfg)

    @jax.jit
    def init(key):
        return model.init(key, jnp.zeros((1, cfg.num_mels, 8)))

    params = init(jax.random.PRNGKey(0))

    def run_module(p, m):
        return jnp.sum(model.apply(p, m).astype(jnp.float32)) * 1e-6

    print(f"module: {chained_ms(run_module, params, mel):7.1f} ms", flush=True)

    packed = pack_bigvgan(params, cfg)
    jax.block_until_ready(jax.tree.leaves(packed)[0])

    def run_packed(p, m):
        return jnp.sum(bigvgan_packed_apply(p, m, cfg)
                       .astype(jnp.float32)) * 1e-6

    print(f"packed: {chained_ms(run_packed, packed, mel):7.1f} ms", flush=True)

    from voice_tts_tpu.models.vocoder.packed import (
        bigvgan_shared_act_apply, pack_bigvgan_shared)
    shared = pack_bigvgan_shared(params, cfg)
    jax.block_until_ready(jax.tree.leaves(shared)[0])

    def run_shared(p, m):
        return jnp.sum(bigvgan_shared_act_apply(p, m, cfg)
                       .astype(jnp.float32)) * 1e-6

    print(f"shared: {chained_ms(run_shared, shared, mel):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
