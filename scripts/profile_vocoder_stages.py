"""Per-stage BigVGAN cost at bench shape (mel 448 frames -> 114k samples).

Times the model truncated after stage i (cumulative), with the axon-honest
method: a jitted fori_loop chaining each output back into the next input
(scalar fold), difference-of-iteration-counts to cancel dispatch/transfer
overhead.  Stage marginals = adjacent differences.

Run in the foreground on the TPU host:
    python scripts/profile_vocoder_stages.py
"""

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from voice_tts_tpu.config import TTSConfig  # noqa: E402
from voice_tts_tpu.models.vocoder import BigVGAN  # noqa: E402


def chained_ms(run, p, mel, lo=4, hi=12, reps=3):
    """run(p, mel) -> scalar; per-call ms via chained fori_loop difference."""
    import functools

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
    print("backend:", jax.default_backend())
    cfg = TTSConfig().vocoder
    mbucket = 448
    mel = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.num_mels, mbucket),
                            jnp.float32)

    full = BigVGAN(cfg)

    @jax.jit
    def init(key):
        return full.init(key, jnp.zeros((1, cfg.num_mels, 8)))

    params = init(jax.random.PRNGKey(0))

    prev = 0.0
    for ns in range(0, len(cfg.upsample_rates) + 1):
        model = BigVGAN(cfg, num_stages=ns)

        def run(p, m, model=model):
            return jnp.sum(model.apply(p, m).astype(jnp.float32)) * 1e-6

        ms = chained_ms(run, params, mel)
        print(f"stages<={ns}: {ms:7.1f} ms  (marginal {ms - prev:+6.1f})",
              flush=True)
        prev = ms


if __name__ == "__main__":
    main()
