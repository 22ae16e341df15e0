#!/usr/bin/env python
"""One-command real-checkpoint onboarding (VERDICT r3 item 6): convert
IndexTTS-2 artifacts, verify them stage by stage, then (optionally) run the
quantization quality gates and an end-to-end bench on the converted weights
— one report, console entry `voice-tts-tpu-convert`.

Points at the reference checkpoint layout (`infer_v2.py:77-176`): a model
dir containing `config.yaml` + the torch/safetensors files it names, plus
the externally-downloaded families (w2v-bert, semantic codec, CAMPPlus,
vocoder).  For every family it

  1. loads the torch state dict (all four reference loader styles are
     folded into `checkpoint.load_state_dict`),
  2. reports key coverage: converted / dropped-by-rule / UNMATCHED source
     keys (the EMA-prefix / fused-qkv surprises real artifacts can carry),
  3. diffs the converted pytree against a fresh `jax.eval_shape` init of
     the mapped flax model: missing leaves, extra leaves, shape mismatches,
  4. (--torch-parity, needs the reference repo importable) runs a small
     random input through the torch module with the real weights and the
     flax module with the converted weights and prints the max deviation,
  5. (--quality-gates) int8/int4 teacher-forced logit-KL gates on the
     CONVERTED gpt weights (`utils/quality_gate.py`) — the decision record
     for the int8 serving default / int4 opt-in,
  6. (--bench) builds a `TTSEngine.from_artifacts(out, profile="serving")`
     and measures warm single-request RTF on the converted artifacts.

Exit code 0 = every requested step passed; 1 otherwise.

Usage (paths per the reference Dockerfile:52-56):
    voice-tts-tpu-convert \
        --model-dir /models/IndexTTS \
        --w2v-bert-dir /models/w2v-bert-2.0 \
        --semantic-codec /models/MaskGCT/semantic_codec/model.safetensors \
        --campplus /models/campplus_cn_common.bin \
        --vocoder /models/bigvgan/bigvgan_generator.pt \
        --out /models/voice_tts_tpu_artifacts \
        --torch-parity --quality-gates --bench

Smoke-tested on random-weight fixtures in tests/test_artifacts.py
(test_convert_and_verify_script_smoke, test_onboard_full_chain_smoke).
"""

import argparse
import dataclasses
import json
import os
import sys

import numpy as np


def _pin_cpu():
    import jax

    if os.environ.get("CONVERT_VERIFY_TPU") != "1":
        # conversion + parity are host-side work; the axon TPU plugin
        # ignores JAX_PLATFORMS so pin through jax.config before any
        # backend init (CONVERT_VERIFY_TPU=1 keeps the default backend —
        # needed when --quality-gates/--bench should run on the chip)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001 — backend already initialized
            pass


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = v
    return out


def build_config_from_reference(y: dict):
    """Map the reference OmegaConf YAML tree (`infer_v2.py:80-199`) onto the
    typed TTSConfig.  Unknown keys are collected, not fatal — the dry run's
    job is to surface them."""
    from voice_tts_tpu.config import (
        ConformerConfig, DiTConfig, LengthRegulatorConfig, RepCodecConfig,
        S2MelConfig, TTSConfig, WaveNetConfig,
    )

    cfg = TTSConfig()
    warnings = []

    def fill(dst, src: dict, label: str, skip=()):
        fields = {f.name for f in dataclasses.fields(dst)}
        for k, v in (src or {}).items():
            if k in skip:
                continue
            if k in fields:
                setattr(dst, k, v)
            else:
                warnings.append(f"{label}.{k} = {v!r} (unmapped)")

    g = dict(y.get("gpt", {}))
    for sub, attr in (("condition_module", "condition_module"),
                      ("emo_condition_module", "emo_condition_module")):
        if sub in g:
            mod = ConformerConfig()
            fill(mod, g.pop(sub), f"gpt.{sub}",
                 skip=("dropout_rate", "positional_dropout_rate",
                       "attention_dropout_rate", "normalize_before",
                       "concat_after", "macaron_style", "use_cnn_module",
                       "activation_type", "pos_enc_layer_type"))
            setattr(cfg.gpt, attr, mod)
    fill(cfg.gpt, g, "gpt",
         skip=("max_conditioning_inputs", "mel_length_compression",
               "train_solo_embeddings", "use_mel_codes_as_input",
               "checkpointing"))

    s = y.get("s2mel", {})
    dit = s.get("DiT", {})
    d = DiTConfig()
    fill(d, dit, "s2mel.DiT",
         skip=("content_codebook_size", "content_type", "final_layer_type",
               "style_condition", "class_dropout_prob", "target_type",
               "dropout_rate", "ffn_dropout_rate", "prompt_cfg_rate",
               "time_as_token", "uvit_skip_connection"))
    if "style_encoder" in s and "dim" in s["style_encoder"]:
        d.style_dim = s["style_encoder"]["dim"]
    wn = WaveNetConfig()
    fill(wn, s.get("wavenet", {}), "s2mel.wavenet",
         skip=("style_condition", "p_dropout"))
    lr_src = dict(s.get("length_regulator", {}))
    lr = LengthRegulatorConfig()
    if "sampling_ratios" in lr_src:
        lr.num_sampling_ratios = len(lr_src.pop("sampling_ratios"))
    lr_src.pop("is_discrete", None)
    lr_src.pop("f0_condition", None)
    lr_src.pop("n_f0_bins", None)
    lr_src.pop("vector_quantize", None)
    if "content_codebook_size" in lr_src:
        lr.codebook_size = lr_src.pop("content_codebook_size")
    if "in_channels" in lr_src:
        lr_src.pop("in_channels")  # implied by the semantic codec width
    fill(lr, lr_src, "s2mel.length_regulator")
    cfg.s2mel = S2MelConfig(dit=d, wavenet=wn, length_regulator=lr)

    sc = RepCodecConfig()
    fill(sc, y.get("semantic_codec", {}), "semantic_codec")
    cfg.semantic_codec = sc

    if "emo_num" in y:
        cfg.engine.emo_num = tuple(y["emo_num"])
    if "version" in y:
        warnings.append(f"version = {y['version']!r} (informational)")
    return cfg, warnings


def coverage_report(name: str, sd: dict, renamer) -> dict:
    """Run the family renamer over every (weight-norm-folded) source key."""
    from voice_tts_tpu.utils.checkpoint import fold_weight_norm, strip_ddp_prefix

    sd = fold_weight_norm(strip_ddp_prefix(sd))
    converted, dropped, unmatched = {}, [], []
    for key, val in sd.items():
        try:
            target = renamer(key)
        except KeyError:
            unmatched.append(key)
            continue
        if target is None:
            dropped.append(key)
        else:
            converted[target] = np.asarray(val)
    return {"name": name, "converted": converted, "dropped": dropped,
            "unmatched": unmatched, "n_source": len(sd)}


def structure_diff(converted: dict, expected_tree) -> dict:
    """Converted leaves vs a jax.eval_shape init of the flax model."""
    exp = {k.replace("params/", "", 1): v
           for k, v in _flatten(expected_tree.get("params", expected_tree)).items()}
    got = converted
    missing = sorted(set(exp) - set(got))
    extra = sorted(set(got) - set(exp))
    mismatched = [
        f"{k}: ckpt{tuple(np.shape(got[k]))} != model{tuple(exp[k].shape)}"
        for k in set(got) & set(exp)
        if tuple(np.shape(got[k])) != tuple(exp[k].shape)]
    return {"missing": missing, "extra": extra, "mismatched": mismatched}


def eval_shape_tree(family: str, cfg):
    """Expected param pytree (shapes only) for a family at the mapped dims."""
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    if family == "gpt":
        from voice_tts_tpu.models.gpt import UnifiedVoice
        m = UnifiedVoice(cfg.gpt)
        c = cfg.gpt
        return jax.eval_shape(
            lambda r: m.init(r,
                             jnp.zeros((1, 8, c.condition_module.input_size)),
                             jnp.zeros((1, 8, c.emo_condition_module.input_size)),
                             jnp.zeros((1, 8), jnp.int32), jnp.asarray([8]),
                             jnp.zeros((1, 6), jnp.int32), jnp.asarray([6]),
                             method=UnifiedVoice.init_all), rng)
    if family == "s2mel":
        from voice_tts_tpu.models.s2mel import S2Mel
        m = S2Mel(cfg.s2mel)
        d = cfg.s2mel.dit
        return jax.eval_shape(
            lambda r: m.init(r, jnp.zeros((1, 6, cfg.semantic_codec.hidden_size)),
                             jnp.asarray([6]), jnp.asarray([8]), 8,
                             jnp.zeros((1, d.in_channels, 8)),
                             jnp.zeros((1, d.in_channels, 8)),
                             jnp.asarray([8]), jnp.zeros((1,)),
                             jnp.zeros((1, d.style_dim)),
                             jnp.zeros((1, 4, cfg.s2mel.gpt_dim))), rng)
    if family == "vocoder":
        from voice_tts_tpu.models.vocoder import BigVGAN
        m = BigVGAN(cfg.vocoder)
        return jax.eval_shape(
            lambda r: m.init(r, jnp.zeros((1, cfg.vocoder.num_mels, 8))), rng)
    if family == "campplus":
        from voice_tts_tpu.models.conditioning import CAMPPlus
        m = CAMPPlus(cfg.campplus)
        return jax.eval_shape(
            lambda r: m.init(r, jnp.zeros((1, 16, cfg.campplus.feat_dim))), rng)
    if family == "repcodec":
        from voice_tts_tpu.models.conditioning import RepCodec
        m = RepCodec(cfg.semantic_codec)
        # reconstruct touches encoder + vq + decoder (real checkpoints ship
        # the decoder weights even though the serving path only quantizes)
        return jax.eval_shape(
            lambda r: m.init(r, jnp.zeros((1, 9, cfg.semantic_codec.hidden_size)),
                             method=RepCodec.reconstruct), rng)
    if family == "w2v":
        from voice_tts_tpu.models.conditioning import Wav2Vec2Bert
        m = Wav2Vec2Bert(cfg.w2v_bert)
        return jax.eval_shape(
            lambda r: m.init(r, jnp.zeros(
                (1, 9, cfg.w2v_bert.feature_projection_input_dim))), rng)
    raise KeyError(family)


FAMILY_RENAMERS = {
    "gpt": lambda cfg: __import__(
        "voice_tts_tpu.utils.checkpoint", fromlist=["x"]).unified_voice_renamer(),
    "s2mel": lambda cfg: __import__(
        "voice_tts_tpu.utils.checkpoint", fromlist=["x"]).s2mel_renamer(
            cfg.s2mel.length_regulator.num_sampling_ratios),
    "vocoder": lambda cfg: __import__(
        "voice_tts_tpu.utils.checkpoint", fromlist=["x"]).bigvgan_renamer(),
    "campplus": lambda cfg: __import__(
        "voice_tts_tpu.utils.checkpoint", fromlist=["x"]).campplus_renamer(),
    "repcodec": lambda cfg: __import__(
        "voice_tts_tpu.utils.checkpoint", fromlist=["x"]).repcodec_renamer(),
    "w2v": lambda cfg: __import__(
        "voice_tts_tpu.utils.checkpoint", fromlist=["x"]).w2v_bert_renamer(
            cfg.w2v_bert.output_layer),
}


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model-dir", help="IndexTTS-2 dir with config.yaml")
    ap.add_argument("--gpt", help="override gpt checkpoint path")
    ap.add_argument("--s2mel", help="override s2mel checkpoint path")
    ap.add_argument("--vocoder", help="BigVGAN generator checkpoint")
    ap.add_argument("--campplus", help="campplus_cn_common.bin")
    ap.add_argument("--semantic-codec", help="MaskGCT semantic codec safetensors")
    ap.add_argument("--w2v-bert-dir", help="facebook/w2v-bert-2.0 dir")
    ap.add_argument("--out", help="write converted artifacts here")
    ap.add_argument("--torch-parity", action="store_true",
                    help="numeric parity vs the reference torch modules "
                         "(needs /root/reference importable)")
    ap.add_argument("--report-json", help="also dump the report as JSON")
    ap.add_argument("--quality-gates", action="store_true",
                    help="run the int8/int4 teacher-forced logit-KL gates "
                         "on the CONVERTED gpt weights (the int8-default / "
                         "int4-opt-in decision record)")
    ap.add_argument("--gate-steps", type=int, default=96,
                    help="teacher-forced steps per quality-gate trajectory")
    ap.add_argument("--bench", action="store_true",
                    help="after writing --out, build the serving-profile "
                         "engine from the converted artifacts and measure "
                         "warm single-request RTF")
    ap.add_argument("--bench-repeats", type=int, default=3)
    args = ap.parse_args()

    _pin_cpu()
    from voice_tts_tpu.utils.checkpoint import load_state_dict, to_tree

    ycfg, cfg_warnings = {}, []
    paths = {}
    if args.model_dir:
        import yaml
        with open(os.path.join(args.model_dir, "config.yaml")) as f:
            ycfg = yaml.safe_load(f)
        from_cfg = {
            "gpt": ycfg.get("gpt_checkpoint"),
            "s2mel": ycfg.get("s2mel_checkpoint"),
        }
        for fam, rel in from_cfg.items():
            if rel:
                paths[fam] = os.path.join(args.model_dir, rel)
    for fam, val in (("gpt", args.gpt), ("s2mel", args.s2mel),
                     ("vocoder", args.vocoder), ("campplus", args.campplus),
                     ("repcodec", args.semantic_codec)):
        if val:
            paths[fam] = val
    if args.w2v_bert_dir:
        paths["w2v"] = os.path.join(args.w2v_bert_dir, "model.safetensors")

    if ycfg:
        cfg, cfg_warnings = build_config_from_reference(ycfg)
    else:
        from voice_tts_tpu.config import TTSConfig
        cfg = TTSConfig()

    print("=" * 72)
    print("convert_and_verify: config mapping")
    for w in cfg_warnings:
        print(f"  [cfg] {w}")
    if not paths:
        print("no checkpoint paths given — nothing to convert "
              "(see --help for the expected layout)")
        return 1

    ok = True
    report = {"families": {}, "cfg_warnings": cfg_warnings}
    params = {}
    for fam, path in paths.items():
        print("=" * 72)
        print(f"[{fam}] {path}")
        if not os.path.exists(path):
            print("  MISSING file"); ok = False
            report["families"][fam] = {"error": "missing file"}
            continue
        sd = load_state_dict(path)
        cov = coverage_report(fam, sd, FAMILY_RENAMERS[fam](cfg))
        diff = structure_diff(cov["converted"],
                              eval_shape_tree(fam, cfg))
        n_conv = len(cov["converted"])
        print(f"  source keys: {cov['n_source']}  converted: {n_conv}  "
              f"dropped-by-rule: {len(cov['dropped'])}  "
              f"UNMATCHED: {len(cov['unmatched'])}")
        for k in cov["unmatched"][:20]:
            print(f"    unmatched: {k}")
        for k in diff["missing"][:20]:
            print(f"    missing in ckpt: {k}")
        for k in diff["mismatched"][:20]:
            print(f"    shape mismatch: {k}")
        extra_real = [k for k in diff["extra"]]
        for k in extra_real[:10]:
            print(f"    extra vs model: {k}")
        fam_ok = not (cov["unmatched"] or diff["missing"] or diff["mismatched"]
                      or extra_real)
        print(f"  => {'OK' if fam_ok else 'PROBLEMS'}")
        ok = ok and fam_ok
        report["families"][fam] = {
            "n_source": cov["n_source"], "n_converted": n_conv,
            "dropped": cov["dropped"], "unmatched": cov["unmatched"],
            **{k: v for k, v in diff.items()},
        }
        params[fam] = {"params": to_tree(cov["converted"])}

    if args.torch_parity:
        print("=" * 72)
        print("torch parity (reference modules with the real weights)")
        try:
            from tests.verify_stages import run_stage_parity
            stage_report = run_stage_parity(cfg, paths, params)
            for fam, err in stage_report.items():
                print(f"  [{fam}] max abs err: {err:.3e}")
                report["families"].setdefault(fam, {})["parity_err"] = err
        except Exception as exc:  # noqa: BLE001 - report, don't crash the dry run
            print(f"  parity run failed: {exc!r}")
            ok = False

    if args.quality_gates and "gpt" in params and ok:
        print("=" * 72)
        print("quantization quality gates (converted gpt weights)")
        from voice_tts_tpu.utils.quality_gate import run_quality_gate
        gate = run_quality_gate(cfg.gpt, params["gpt"],
                                steps=args.gate_steps)
        report["quality_gates"] = gate
        for name, row in gate["teacher_forced"].items():
            print(f"  [{name}] KL mean {row['kl_mean']:.3e} "
                  f"max {row['kl_max']:.3e} "
                  f"top1 {row['top1_agreement']:.3f}")

    if args.out and ok:
        from voice_tts_tpu.utils.artifacts import save_artifacts
        extras = {}
        if ycfg.get("w2v_stat") and args.model_dir:
            stats = load_state_dict(os.path.join(args.model_dir, ycfg["w2v_stat"]))
            extras["w2v_mean"] = np.asarray(stats["mean"])
            extras["w2v_std"] = np.sqrt(np.asarray(stats["var"]))
        for key, name in (("emo_matrix", "emo_matrix_raw"),
                          ("spk_matrix", "spk_matrix_raw")):
            if ycfg.get(key) and args.model_dir:
                mat = load_state_dict(os.path.join(args.model_dir, ycfg[key]))
                extras[name] = (next(iter(mat.values()))
                                if isinstance(mat, dict) else mat)
        bpe = None
        bpe_rel = (ycfg.get("dataset") or {}).get("bpe_model")
        if bpe_rel and args.model_dir:
            with open(os.path.join(args.model_dir, bpe_rel), "rb") as f:
                bpe = f.read()
        save_artifacts(args.out, cfg, params, extras, bpe)
        print(f"artifacts written to {args.out}")

    if args.bench and args.out and ok:
        print("=" * 72)
        print("end-to-end bench on the converted artifacts (serving profile)")
        try:
            import time

            from voice_tts_tpu.audio import encode_wav_int16
            from voice_tts_tpu.engine import TTSEngine

            engine = TTSEngine.from_artifacts(args.out, profile="serving")
            sr = engine.cfg.engine.sample_rate
            t = np.arange(5 * sr) / sr
            tone = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
            prompt = encode_wav_int16(tone * 32767, sr)
            text = "今天天气真好我们一起出去散步聊天吧."
            engine.infer(prompt, text, None)  # compile
            rtfs = []
            for _ in range(args.bench_repeats):
                t0 = time.perf_counter()
                res = engine.infer(prompt, text, None)
                rtfs.append(res.metrics["rtf"])
            rtf = float(np.median(rtfs))
            print(f"  warm RTF (median of {args.bench_repeats}): {rtf:.4f}")
            report["bench"] = {"rtf": rtf, "repeats": args.bench_repeats,
                               "profile": "serving"}
        except Exception as exc:  # noqa: BLE001 — report, don't lose the run
            print(f"  bench failed: {exc!r}")
            report["bench"] = {"error": repr(exc)}
            ok = False

    if args.report_json:
        with open(args.report_json, "w") as f:
            json.dump(report, f, indent=2)
    print("=" * 72)
    print("RESULT:", "OK" if ok else "PROBLEMS FOUND")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
