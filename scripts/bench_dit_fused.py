"""A/B: DiT velocity eval + 25-step CFM solve, einsum vs whole-trunk
Pallas megakernel (ops/dit_blocks.py).

Flagship shapes (CFG-doubled batch 2, T 704), random weights.  Chained
difference timing (axon: independent dispatches dedupe).

Run in the foreground:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_dit_fused.py
"""

import functools
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from voice_tts_tpu.config import TTSConfig  # noqa: E402
from voice_tts_tpu.models.s2mel.cfm import cfm_inference  # noqa: E402
from voice_tts_tpu.models.s2mel.dit import DiT  # noqa: E402
from voice_tts_tpu.ops.attic.dit_blocks import (pack_dit_blocks,  # noqa: E402
                                          pack_dit_tables)


def chained_ms(loop, w, x, lo=2, hi=8, reps=3):
    float(loop(w, x, lo))
    float(loop(w, x, hi))

    def t(n, s):
        t0 = time.perf_counter()
        float(loop(w, x + s * 1e-6, n))
        return time.perf_counter() - t0

    tlo = min(t(lo, 1 + i) for i in range(reps))
    thi = min(t(hi, 10 + i) for i in range(reps))
    return (thi - tlo) / (hi - lo) * 1e3


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = TTSConfig()
    t_frames = 704
    b = 2  # CFG-doubled

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, 80, t_frames), jnp.float32)
    prompt = jax.random.normal(ks[1], (b, 80, t_frames), jnp.float32) * 0.1
    style = jax.random.normal(ks[2], (b, 192), jnp.float32)
    cond = jax.random.normal(ks[3], (b, t_frames, 512), jnp.float32)
    lens = jnp.asarray([t_frames, t_frames], jnp.int32)
    tt = jnp.full((b,), 0.4, jnp.float32)

    model = DiT(cfg.s2mel.dit, cfg.s2mel.wavenet)

    @jax.jit
    def init(k):
        return model.init(k, x, prompt, lens, tt, style, cond)

    params = init(ks[4])
    n_steps = cfg.engine.diffusion_steps

    for fused in (False, True):
        @functools.partial(jax.jit, static_argnames=("n",))
        def vel_loop(p, xx, n, _f=fused):
            t_span = jnp.asarray([0.4])
            tab = model.apply(p, t_span, method=DiT.step_tables)
            fw = None
            if _f:
                fw = pack_dit_blocks(p, cfg.s2mel.dit.depth)
                tab["fused_wb"] = pack_dit_tables(p, tab, cfg.s2mel.dit.depth)
            tab0 = jax.tree.map(lambda a: a[0], tab)

            def body(i, acc):
                v = model.apply(p, xx + acc * 1e-9, prompt, lens,
                                tt + i * 1e-6, style, cond, tables=tab0,
                                fused_w=fw)
                return acc + jnp.sum(v) * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        ms = chained_ms(vel_loop, params, x, lo=2, hi=8)
        print(f"velocity eval  fused={int(fused)}: {ms:7.2f} ms", flush=True)

        @functools.partial(jax.jit, static_argnames=("n",))
        def cfm_loop(p, mm, n, _f=fused):
            t_mids = jnp.linspace(0.0, 1.0, n_steps + 1)[:n_steps]
            tab = model.apply(p, t_mids, method=DiT.step_tables)
            fw = None
            if _f:
                fw = pack_dit_blocks(p, cfg.s2mel.dit.depth)
                tab["fused_wb"] = pack_dit_tables(p, tab, cfg.s2mel.dit.depth)

            def dit_apply(pp, xx, px, ll, ttt, ss, mmu, t2):
                return model.apply(pp, xx, px, ll, ttt, ss, mmu, tables=t2,
                                   fused_w=fw)

            def body(i, acc):
                mel = cfm_inference(
                    dit_apply, p, mm + acc * 1e-9, lens[:1],
                    prompt[:1], jnp.asarray([160]), style[:1], None,
                    n_steps, cfg.engine.inference_cfg_rate,
                    noise=x[:1] + i * 1e-6, tables=tab)
                return acc + jnp.sum(mel) * 1e-9
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        ms = chained_ms(cfm_loop, params, cond[:1], lo=1, hi=3)
        print(f"25-step CFM    fused={int(fused)}: {ms:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
