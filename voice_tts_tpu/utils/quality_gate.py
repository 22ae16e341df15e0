"""Quantization quality gates for the GPT decode path.

Measures, for a GIVEN UnifiedVoice params tree (converted real weights via
`voice-tts-tpu-convert --quality-gates`, or random flagship-dim weights via
`scripts/int4_quality.py`):

1. greedy FREE-RUNNING code identity: int8/int4 megakernel decode vs the
   XLA bf16 path on identical prompts (prefix-match length + exact-match);
2. TEACHER-FORCED per-step logit divergence along the bf16-greedy
   trajectory: KL(softmax_ref || softmax_q), top-1 agreement, max |dlogit|.

This is the decision record behind the precision defaults: int8 is the
serving default (round-3 measurement: KL 4.2e-5/step at flagship dims),
int4 stays opt-in until a run on REAL weights bounds its KL
(`bench_results/r3/int4_quality.json`, STATUS.md round 3 item 7).
Reference behavior being gated: fp16 GPT autocast (`infer_v2.py:628`) with
no quantization at all — every scheme here is a TPU-side speed/quality
trade the reference doesn't offer.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def run_quality_gate(cfg, params, steps: int = 96, prompts: int = 1,
                     interpret: Optional[bool] = None) -> dict:
    """Run both gates on `params` (a UnifiedVoice params tree at `cfg` dims).

    Returns {"config", "free_running": [...], "teacher_forced": {...}}.
    `interpret=None` auto-selects interpret-mode Pallas off-TPU.
    """
    import jax
    import jax.numpy as jnp

    from voice_tts_tpu.config import GenerationConfig
    from voice_tts_tpu.models.gpt.decode import decode
    from voice_tts_tpu.models.gpt.unified_voice import (UnifiedVoice,
                                                        n_cond_latents)
    from voice_tts_tpu.ops.fused_decode import (
        BLOCK_T, apply_kv_update, cache_to_time_major, fused_decode_step,
        pack_gpt, pack_gpt_int4, pack_readout)
    from voice_tts_tpu.utils.quantize import quantize_gpt_params

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    model = UnifiedVoice(cfg)
    d = cfg.model_dim
    bl = min(24, max(cfg.max_text_tokens - 2, 4))

    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)

    qtree = quantize_gpt_params(params)
    pack8 = pack_gpt(qtree, cfg.layers)
    pack4 = pack_gpt_int4(params, cfg.layers)
    # wide-group variant (one scale group per packed half: full-rate MXU
    # sub-dots; see config.int4_group) — quality delta vs g128 measured here
    pack4w = pack_gpt_int4(params, cfg.layers, group=cfg.model_dim // 2)

    gen = GenerationConfig(do_sample=False, num_beams=1,
                           repetition_penalty=10.0, max_mel_tokens=steps)

    results = {"config": {"layers": cfg.layers, "model_dim": d,
                          "steps": steps, "prompts": prompts},
               "free_running": [], "teacher_forced": {}}

    nc = n_cond_latents(cfg)
    ro = pack_readout(qtree)
    # (weight pack, int4 scheme, readout pack): rofold additionally
    # quantizes the LOGITS head to int8 (EngineConfig.fold_readout)
    packs = {"int8": (pack8, False, None), "int4": (pack4, False, None),
             "int4_i8sh": (pack4, "i8sh", None),
             "int4_gwide": (pack4w, False, None),
             "int8_rofold": (pack8, False, ro)}

    # ---------------- free-running greedy code identity ----------------
    for pi in range(prompts):
        prng = jax.random.PRNGKey(100 + pi)
        cond = jax.random.normal(prng, (1, nc, d)) * 0.3
        emo = jax.random.normal(jax.random.fold_in(prng, 1), (1, d)) * 0.1
        text = jax.random.randint(jax.random.fold_in(prng, 2), (1, bl), 2,
                                  cfg.number_text_tokens)
        tlen = jnp.asarray([bl])
        ref = decode(params_bf16, model, gen, cond, emo, text, tlen,
                     prng, max_new=steps)
        ref_codes = np.asarray(ref.codes[0])
        ref_len = int(ref.lengths[0])
        row = {"prompt": pi, "ref_len": ref_len}
        for name, (pack, expand, ro_pack) in packs.items():
            res = decode(params_bf16, model, gen, cond, emo, text, tlen,
                         prng, max_new=steps, fused_pack=pack,
                         int4_expand=expand, merge_stages=3,
                         readout_pack=ro_pack)
            codes = np.asarray(res.codes[0])
            n = min(ref_len, int(res.lengths[0]))
            agree = 0
            for t in range(n):
                if codes[t] != ref_codes[t]:
                    break
                agree += 1
            row[name] = {"prefix_match": agree, "len": int(res.lengths[0]),
                         "exact": bool(agree == ref_len
                                       == int(res.lengths[0]))}
        results["free_running"].append(row)

    # ------------- teacher-forced per-step logit divergence -------------
    # drive every path along the SAME (bf16-greedy) token trajectory and
    # compare the logits each path produces at each step
    prng = jax.random.PRNGKey(100)
    cond = jax.random.normal(prng, (1, nc, d)) * 0.3
    emo = jax.random.normal(jax.random.fold_in(prng, 1), (1, d)) * 0.1
    text = jax.random.randint(jax.random.fold_in(prng, 2), (1, bl), 2,
                              cfg.number_text_tokens)
    tlen = jnp.asarray([bl])
    ref = decode(params_bf16, model, gen, cond, emo, text, tlen, prng,
                 max_new=steps)
    traj = np.asarray(ref.codes[0])[:max(int(ref.lengths[0]) - 1, 1)]

    p = nc + 2 + bl + 2
    t_max = p + 1 + steps
    t_max += (-t_max) % BLOCK_T

    def forced_logits(pack, expand, ro_pack=None):
        """Step the megakernel along `traj`, returning (T, V) logits."""
        prompt, valid_p = model.apply(params_bf16, cond.astype(jnp.bfloat16),
                                      emo.astype(jnp.bfloat16), text, tlen,
                                      method=UnifiedVoice.build_prompt)
        hd = d // cfg.heads
        cache0 = jnp.zeros((cfg.layers, 2, 1, cfg.heads, hd, t_max),
                           prompt.dtype)
        logits0, cache = model.apply(params_bf16, prompt, valid_p, cache0,
                                     method=UnifiedVoice.prefill)
        valid = jnp.concatenate(
            [valid_p, jnp.ones((1, t_max - p), bool)], axis=1)
        outs = [logits0]
        if pack is None:
            for step, tok in enumerate(traj, start=1):
                logits, cache = model.apply(
                    params_bf16, jnp.asarray([tok]), jnp.asarray(step - 1),
                    p + step, valid, cache,
                    method=UnifiedVoice.decode_step)
                outs.append(logits)
        else:
            bias = jnp.where(valid[0, :, None], 0.0,
                             -1e30).astype(jnp.float32)
            cache = cache_to_time_major(cache)
            for step, tok in enumerate(traj, start=1):
                emb = model.apply(params_bf16, jnp.asarray([tok]),
                                  jnp.asarray(step - 1),
                                  method=UnifiedVoice.embed_decode_token)
                if ro_pack is not None:
                    _, kv_new, lp = fused_decode_step(
                        emb, pack, cache, bias, p + step, cfg.heads,
                        interpret=interpret, int4_expand=expand,
                        merge_stages=3, readout_pack=ro_pack)
                    cache = apply_kv_update(cache, kv_new, p + step)
                    outs.append(lp[:, :cfg.number_mel_codes])
                else:
                    hidden, kv_new = fused_decode_step(
                        emb, pack, cache, bias, p + step, cfg.heads,
                        interpret=interpret, int4_expand=expand,
                        merge_stages=3)
                    cache = apply_kv_update(cache, kv_new, p + step)
                    outs.append(model.apply(params_bf16, hidden,
                                            method=UnifiedVoice.readout))
        return np.stack([np.asarray(o[0], np.float32) for o in outs])

    ref_logits = forced_logits(None, False)
    ref_logp = jax.nn.log_softmax(ref_logits, axis=-1)
    for name, (pack, expand, ro_pack) in packs.items():
        ql = forced_logits(pack, expand, ro_pack)
        qlogp = jax.nn.log_softmax(ql, axis=-1)
        pref = np.exp(np.asarray(ref_logp))
        kl = np.sum(pref * (np.asarray(ref_logp) - np.asarray(qlogp)),
                    axis=-1)
        top1 = (ref_logits.argmax(-1) == ql.argmax(-1)).mean()
        results["teacher_forced"][name] = {
            "kl_mean": float(kl.mean()), "kl_max": float(kl.max()),
            "top1_agreement": float(top1),
            "max_abs_dlogit": float(np.abs(ql - ref_logits).max()),
        }
    return results
