"""Beam-vs-sampling decode quality study (round-5 VERDICT item 6).

The production default keeps the reference's `num_beams=3, do_sample=True`
(`/root/reference/indextts/infer_v2.py:604`).  This study quantifies what
beam-3 BUYS over plain sampling on the only axis measurable without trained
weights: sequence likelihood under the model — which is exactly the
objective HF's beam-sample scorer accumulates.  Each config's emitted codes
are re-scored TEACHER-FORCED under the same bf16 model:

- `raw_lp`: mean per-token log p(code_t | prefix) (plain log-softmax);
- `rep_lp`: the same with the repetition penalty applied to the logits
  (the quantity the beam scorer actually optimizes, minus the sampling
  warpers, which only reshape the candidate set).

Beam should win by construction; the committed number says BY HOW MUCH, and
whether sampling's gap is small enough to justify flipping the serving
profile if batched-beam throughput were ever the constraint.  Perceptual
validation needs real checkpoints (`voice-tts-tpu-convert --quality-gates`).

Writes ONE JSON blob to --out (default bench_results/r5/beam_quality.json).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results/r5/beam_quality.json")
    ap.add_argument("--prompts", type=int, default=3)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from voice_tts_tpu.config import GenerationConfig, TTSConfig
    from voice_tts_tpu.models.gpt.beam import beam_decode
    from voice_tts_tpu.models.gpt.decode import (apply_repetition_penalty,
                                                 decode)
    from voice_tts_tpu.models.gpt.unified_voice import (UnifiedVoice,
                                                        n_cond_latents)

    cfg = (TTSConfig.tiny() if args.tiny else TTSConfig()).gpt
    steps = min(args.steps, 16 if args.tiny else args.steps)
    model = UnifiedVoice(cfg)
    d = cfg.model_dim
    bl = min(24, max(cfg.max_text_tokens - 2, 4))
    nc = n_cond_latents(cfg)

    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 6, 1024)),
                        jnp.zeros((1, 5), dtype=jnp.int32), jnp.asarray([5]),
                        jnp.zeros((1, 7), dtype=jnp.int32), jnp.asarray([7]),
                        method=UnifiedVoice.init_all)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    rep = 10.0  # the reference default repetition_penalty
    configs = {
        "greedy": GenerationConfig(do_sample=False, num_beams=1,
                                   repetition_penalty=rep,
                                   max_mel_tokens=steps),
        "sampling": GenerationConfig(do_sample=True, num_beams=1, top_k=30,
                                     top_p=0.8, temperature=0.8,
                                     repetition_penalty=rep,
                                     max_mel_tokens=steps),
        "beam3_sample": GenerationConfig(do_sample=True, num_beams=3,
                                         top_k=30, top_p=0.8,
                                         temperature=0.8,
                                         repetition_penalty=rep,
                                         max_mel_tokens=steps),
        "beam3_search": GenerationConfig(do_sample=False, num_beams=3,
                                         repetition_penalty=rep,
                                         max_mel_tokens=steps),
    }

    # ONE jitted decode step, python-looped along the trajectory (the
    # quality_gate pattern): a 200-step lax.scan of the flagship step
    # compiles into a graph big enough to break the axon tunnel's
    # remote_compile transport (observed twice)
    def _step(params_, tok, step_idx, pos, valid, cache):
        return model.apply(params_, tok, step_idx, pos, valid, cache,
                           method=UnifiedVoice.decode_step)

    step_fn = jax.jit(_step)

    def forced_logits(cond, emo, text, tlen, codes):
        """Teacher-forced logits along `codes` (1, T)."""
        prompt, valid_p = model.apply(params, cond.astype(jnp.bfloat16),
                                      emo.astype(jnp.bfloat16), text, tlen,
                                      method=UnifiedVoice.build_prompt)
        p = prompt.shape[1]
        t_max = p + 1 + steps
        t_max += (-t_max) % 256
        hd = d // cfg.heads
        cache0 = jnp.zeros((cfg.layers, 2, 1, cfg.heads, hd, t_max),
                           prompt.dtype)
        logits0, cache = model.apply(params, prompt, valid_p, cache0,
                                     method=UnifiedVoice.prefill)
        valid = jnp.concatenate(
            [valid_p, jnp.ones((1, t_max - p), bool)], axis=1)
        outs = [logits0]
        toks = np.asarray(codes[0])
        for step in range(1, steps):
            logits, cache = step_fn(
                params, jnp.asarray([int(toks[step - 1])]),
                jnp.asarray(step - 1), jnp.asarray(p + step), valid, cache)
            outs.append(logits)
        return jnp.concatenate(outs, axis=0)  # (steps, V)

    def seq_scores(cond, emo, text, tlen, codes, length):
        """Mean per-token raw and repetition-penalized log-probs of the
        emitted sequence (including its stop token, like the beam scorer)."""
        lg = np.asarray(forced_logits(cond, emo, text, tlen, codes),
                        np.float32)          # (steps, V)
        vocab = lg.shape[-1]
        n = int(min(length, steps))
        toks = np.asarray(codes[0][:n])
        raw = 0.0
        repp = 0.0
        presence = np.zeros((vocab,), bool)
        presence[1] = True
        presence[cfg.start_mel_token] = True
        for t in range(n):
            row = lg[t]
            lp = row - np.log(np.exp(row - row.max()).sum()) - row.max()
            raw += lp[toks[t]]
            # the beam scorer's exact per-step quantity: repetition penalty
            # applied to the LOG-SOFTMAX scores (HF semantics: score*rep
            # when negative), accumulated unnormalized
            pen = np.where(presence, np.where(lp > 0, lp / rep, lp * rep),
                           lp)
            repp += pen[toks[t]]
            presence[toks[t]] = True
        return raw / max(n, 1), repp / max(n, 1), n

    results = {"config": {"layers": cfg.layers, "model_dim": d,
                          "steps": steps, "prompts": args.prompts,
                          "repetition_penalty": rep},
               "per_prompt": [], "summary": {}}
    agg = {k: {"raw": [], "rep": [], "len": [], "wall": []}
           for k in configs}

    for pi in range(args.prompts):
        prng = jax.random.PRNGKey(100 + pi)
        cond = jax.random.normal(prng, (1, nc, d)) * 0.3
        emo = jax.random.normal(jax.random.fold_in(prng, 1), (1, d)) * 0.1
        text = jax.random.randint(jax.random.fold_in(prng, 2), (1, bl), 2,
                                  cfg.number_text_tokens)
        tlen = jnp.asarray([bl])
        row = {"prompt": pi}
        for name, gen in configs.items():
            t0 = time.perf_counter()
            if gen.num_beams > 1:
                res = beam_decode(params, model, gen, cond, emo, text, tlen,
                                  prng, max_new=steps)
            else:
                res = decode(params, model, gen, cond, emo, text, tlen,
                             prng, max_new=steps)
            jax.block_until_ready(res.codes)
            wall = time.perf_counter() - t0
            raw, repp, n = seq_scores(cond, emo, text, tlen, res.codes,
                                      int(res.lengths[0]))
            row[name] = {"raw_lp_per_tok": round(float(raw), 4),
                         "rep_lp_per_tok": round(float(repp), 4),
                         "len": n, "wall_s": round(wall, 2)}
            agg[name]["raw"].append(raw)
            agg[name]["rep"].append(repp)
            agg[name]["len"].append(n)
            agg[name]["wall"].append(wall)
        results["per_prompt"].append(row)

    for name, a in agg.items():
        results["summary"][name] = {
            "mean_raw_lp_per_tok": round(float(np.mean(a["raw"])), 4),
            "mean_rep_lp_per_tok": round(float(np.mean(a["rep"])), 4),
            "mean_len": round(float(np.mean(a["len"])), 1)}
    s = results["summary"]
    results["summary"]["beam3_sample_minus_sampling_rep_lp"] = round(
        s["beam3_sample"]["mean_rep_lp_per_tok"]
        - s["sampling"]["mean_rep_lp_per_tok"], 4)
    results["summary"]["note"] = (
        "rep_lp is the objective the HF beam scorer accumulates; beam-3 "
        "winning it by this margin is what the reference default buys. "
        "Perceptual quality needs real checkpoints.")

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results["summary"]))


if __name__ == "__main__":
    main()
