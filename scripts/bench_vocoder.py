"""BigVGAN vocoder A/B at bench shape (mel 448 frames -> 114k samples).

Variants: pallas-AA vs jnp-AA, fp32 vs bf16 params+input.  K async
dispatches + one sync isolate device time from the remote-dispatch overhead.

Run in the foreground on the TPU host:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_vocoder.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from voice_tts_tpu.config import TTSConfig
from voice_tts_tpu.models.vocoder import BigVGAN


def main():
    print("backend:", jax.default_backend())
    cfg = TTSConfig().vocoder
    mbucket = 448

    mel = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.num_mels, mbucket),
                            jnp.float32)

    def bench(label, use_pallas, dtype):
        model = BigVGAN(cfg, use_pallas=use_pallas)

        @jax.jit
        def init(key):
            return model.init(key, jnp.zeros((1, cfg.num_mels, 8)))

        params = init(jax.random.PRNGKey(0))
        if dtype == jnp.bfloat16:
            params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)

        @jax.jit
        def run(p, m):
            return jnp.sum(model.apply(p, m.astype(dtype)).astype(jnp.float32))

        run(params, mel).block_until_ready()
        best = np.inf
        for r in range(3):
            t0 = time.perf_counter()
            for i in range(8):
                out = run(params, mel + i * 1e-6)
            out.block_until_ready()
            best = min(best, (time.perf_counter() - t0) / 8)
        print(f"{label:24s} {best*1e3:7.1f} ms/call")

    bench("pallas + fp32", True, jnp.float32)
    bench("jnp-AA + fp32", False, jnp.float32)
    bench("pallas + bf16", True, jnp.bfloat16)
    bench("jnp-AA + bf16", False, jnp.bfloat16)


if __name__ == "__main__":
    main()
