"""A/B: fused-stage BigVGAN vs module path at bench shape (mel 448 frames).

Chained fori_loop difference timing.  Run in the foreground:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_fused_vocoder.py
"""

import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from voice_tts_tpu.config import TTSConfig  # noqa: E402
from voice_tts_tpu.models.vocoder import BigVGAN  # noqa: E402
from voice_tts_tpu.ops.attic.fused_vocoder import (  # noqa: E402
    bigvgan_fused_apply, fused_stage_plan, pack_fused_stages)


def chained_ms(run, weights, mel, lo=4, hi=12, reps=3):
    # weights passed as a jit ARG: closing over them would bake them into
    # the HLO as literals — too big for the axon remote-compile tunnel (413)
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(w, m, n):
        def body(i, acc):
            return acc + run(w, m + acc * 1e-9 + i * 1e-9)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(loop(weights, mel, lo))
    float(loop(weights, mel, hi))

    def t(n, s):
        t0 = time.perf_counter()
        float(loop(weights, mel + s * 1e-6, n))
        return time.perf_counter() - t0

    tlo = min(t(lo, 1 + i) for i in range(reps))
    thi = min(t(hi, 10 + i) for i in range(reps))
    return (thi - tlo) / (hi - lo) * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = TTSConfig().vocoder
    print("fused plan:", fused_stage_plan(cfg), flush=True)
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.num_mels, 448),
                            jnp.float32)
    model = BigVGAN(cfg)

    @jax.jit
    def init(key):
        return model.init(key, jnp.zeros((1, cfg.num_mels, 8)))

    params = init(jax.random.PRNGKey(0))
    packs = jax.jit(lambda p: pack_fused_stages(p, cfg))(params)
    jax.block_until_ready(jax.tree.leaves(packs)[0])

    def run_fused(w, m):
        p, pk = w
        return jnp.sum(bigvgan_fused_apply(p, pk, m, cfg)
                       .astype(jnp.float32)) * 1e-6

    print(f"fused:  {chained_ms(run_fused, (params, packs), mel):7.1f} ms",
          flush=True)

    def run_module(w, m):
        return jnp.sum(model.apply(w, m).astype(jnp.float32)) * 1e-6

    print(f"module: {chained_ms(run_module, params, mel):7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
