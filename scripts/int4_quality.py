"""int4 quality gate (VERDICT r2 item 5): bound the damage of RTN-int4 decode
without real checkpoints.

The gate core lives in `voice_tts_tpu/utils/quality_gate.py` (so
`voice-tts-tpu-convert --quality-gates` can run it on CONVERTED real
weights); this script drives it on flagship-dim random weights (seeded),
which bounds the logit perturbation each quantization scheme introduces
relative to the same network at higher precision.

Run on the TPU (queue wave B):
    python scripts/int4_quality.py --steps 96 --prompts 3 \
        --out bench_results/r3/int4_quality.json

CPU smoke (tiny dims, interpret-mode kernels):
    python scripts/int4_quality.py --tiny --steps 8 --prompts 1
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--prompts", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from voice_tts_tpu.config import GPTConfig, TTSConfig
    from voice_tts_tpu.models.gpt.unified_voice import UnifiedVoice
    from voice_tts_tpu.utils.quality_gate import run_quality_gate

    cfg = TTSConfig.tiny().gpt if args.tiny else GPTConfig()
    model = UnifiedVoice(cfg)
    rng = jax.random.PRNGKey(0)

    # random flagship-dim weights (same init path the engine uses)
    params = jax.jit(functools.partial(
        model.init, method=UnifiedVoice.init_all))(
        rng, jnp.zeros((1, 6, cfg.condition_module.input_size)),
        jnp.zeros((1, 6, cfg.emo_condition_module.input_size)),
        jnp.ones((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6]))

    results = run_quality_gate(cfg, params, steps=args.steps,
                               prompts=args.prompts, interpret=args.tiny)
    for row in results["free_running"]:
        print("free-running", row, flush=True)
    for name, tf in results["teacher_forced"].items():
        print("teacher-forced", name, tf, flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
