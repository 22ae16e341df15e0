"""Artifact store round-trip + engine loading."""

import numpy as np

from voice_tts_tpu.utils.artifacts import (
    load_artifacts, save_artifacts, split_matrix_groups,
)


def test_artifact_roundtrip(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from test_engine import _tiny_engine

    from voice_tts_tpu.engine import TTSEngine
    from voice_tts_tpu.text.sp_model import Piece, PieceType, serialize_model

    engine = _tiny_engine()
    bpe = serialize_model([Piece("<unk>", 0.0, PieceType.UNKNOWN),
                           Piece("a", -1.0)])
    extras = {
        "w2v_mean": np.asarray(engine.w2v_mean),
        "w2v_std": np.asarray(engine.w2v_std),
        "emo_matrix": [np.asarray(m) for m in engine.emo_matrix],
        "spk_matrix": [np.asarray(m) for m in engine.spk_matrix],
    }
    save_artifacts(str(tmp_path), engine.cfg, engine.params, extras, bpe)

    cfg, params, loaded_extras, bpe2 = load_artifacts(str(tmp_path))
    assert cfg.to_dict() == engine.cfg.to_dict()
    assert set(params) == set(engine.params)
    assert bpe2 == bpe
    np.testing.assert_array_equal(loaded_extras["w2v_mean"],
                                  np.asarray(engine.w2v_mean))
    assert len(loaded_extras["emo_matrix"]) == len(engine.emo_matrix)

    # param leaves identical
    import jax
    for fam in params:
        a = jax.tree.leaves(params[fam])
        b = jax.tree.leaves(engine.params[fam])
        assert len(a) == len(b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # engine loads from the directory (hash tokenizer path since the toy
    # bpe lacks coverage)
    engine2 = TTSEngine.from_artifacts(str(tmp_path))
    assert engine2.cfg.gpt.model_dim == engine.cfg.gpt.model_dim


def test_split_matrix_groups():
    mat = np.arange(20).reshape(10, 2)
    groups = split_matrix_groups(mat, (3, 2, 5))
    assert [g.shape[0] for g in groups] == [3, 2, 5]
    np.testing.assert_array_equal(np.concatenate(groups), mat)


def test_convert_and_verify_script_smoke(tmp_path):
    """`scripts/convert_and_verify.py` on random-weight torch fixtures laid
    out like a real IndexTTS-2 model dir: every family converts with zero
    unmatched keys, structure-diff clean, torch parity within fp32 noise,
    artifacts written (VERDICT r1 item 8)."""
    import pytest
    import subprocess
    import sys
    import os
    import json

    from tests.reference_oracle import reference_available
    if not reference_available():
        pytest.skip("reference repo not mounted")

    import torch
    import yaml
    from tests.test_pipeline_parity import (
        GPT_CFG, S2_CFG, REP_CFG, VOC_CFG, stack as _unused,  # noqa: F401
    )
    import tests.test_pipeline_parity as tpp

    (ref_gpt, ref_s2, ref_rep, ref_voc), _params = tpp.stack.__wrapped__()
    from indextts.s2mel.modules.campplus.DTDNN import CAMPPlus as RefCAMPPlus
    torch.manual_seed(5)
    ref_camp = RefCAMPPlus(feat_dim=16, embedding_size=24)

    model_dir = tmp_path / "IndexTTS"
    model_dir.mkdir()
    torch.save(ref_gpt.state_dict(), model_dir / "gpt.pth")
    torch.save(ref_s2.state_dict(), model_dir / "s2mel.pth")
    torch.save(ref_voc.state_dict(), tmp_path / "bigvgan_generator.pt")
    torch.save(ref_rep.state_dict(), tmp_path / "semantic_codec.pth")
    torch.save(ref_camp.state_dict(), tmp_path / "campplus.bin")

    cm = GPT_CFG.condition_module
    ycfg = {
        "gpt": {
            "layers": GPT_CFG.layers, "model_dim": GPT_CFG.model_dim,
            "heads": GPT_CFG.heads,
            "max_text_tokens": GPT_CFG.max_text_tokens,
            "max_mel_tokens": GPT_CFG.max_mel_tokens,
            "number_text_tokens": GPT_CFG.number_text_tokens,
            "number_mel_codes": GPT_CFG.number_mel_codes,
            "start_mel_token": GPT_CFG.start_mel_token,
            "stop_mel_token": GPT_CFG.stop_mel_token,
            "condition_num_latent": GPT_CFG.condition_num_latent,
            "condition_type": "conformer_perceiver",
            "condition_module": {
                "input_size": cm.input_size, "output_size": cm.output_size,
                "attention_heads": cm.attention_heads,
                "linear_units": cm.linear_units, "num_blocks": cm.num_blocks,
                "input_layer": cm.input_layer,
                "perceiver_mult": cm.perceiver_mult,
                "dropout_rate": 0.1,   # known-irrelevant key: silently skipped
                "bogus_knob": 42,      # unknown key: must only warn
            },
            "emo_condition_module": {
                "input_size": cm.input_size, "output_size": cm.output_size,
                "attention_heads": cm.attention_heads,
                "linear_units": cm.linear_units, "num_blocks": 1,
                "input_layer": cm.input_layer,
                "perceiver_mult": cm.perceiver_mult,
            },
        },
        "gpt_checkpoint": "gpt.pth",
        "s2mel_checkpoint": "s2mel.pth",
        "s2mel": {
            "DiT": {"hidden_dim": S2_CFG.dit.hidden_dim,
                    "depth": S2_CFG.dit.depth,
                    "num_heads": S2_CFG.dit.num_heads,
                    "in_channels": S2_CFG.dit.in_channels,
                    "content_dim": S2_CFG.dit.content_dim,
                    "content_codebook_size": 64,
                    "style_condition": True},
            "style_encoder": {"dim": S2_CFG.dit.style_dim},
            "wavenet": {"hidden_dim": S2_CFG.wavenet.hidden_dim,
                        "kernel_size": S2_CFG.wavenet.kernel_size,
                        "dilation_rate": S2_CFG.wavenet.dilation_rate,
                        "num_layers": S2_CFG.wavenet.num_layers},
            "length_regulator": {"channels": S2_CFG.length_regulator.channels,
                                 "sampling_ratios": [1, 1],
                                 "content_codebook_size": 64,
                                 "is_discrete": False, "in_channels": 32},
        },
        "semantic_codec": {"codebook_size": REP_CFG.codebook_size,
                           "hidden_size": REP_CFG.hidden_size,
                           "codebook_dim": REP_CFG.codebook_dim,
                           "vocos_dim": REP_CFG.vocos_dim,
                           "vocos_intermediate_dim":
                               REP_CFG.vocos_intermediate_dim,
                           "vocos_num_layers": REP_CFG.vocos_num_layers},
        "version": "2.0",
    }
    with open(model_dir / "config.yaml", "w") as f:
        yaml.safe_dump(ycfg, f)

    # the script maps cfg.vocoder/campplus from defaults; write the tiny dims
    # via the gpt-side config surface it exposes: vocoder/campplus tiny dims
    # are passed through TTSConfig defaults -> override with env-free args is
    # not supported, so patch the config inside the subprocess via a tiny
    # driver that reuses the script's functions.
    driver = tmp_path / "drive.py"
    driver.write_text(f"""
import sys, os, json
sys.path.insert(0, {str(os.getcwd())!r})
import jax
jax.config.update("jax_platforms", "cpu")
sys.argv = ["convert_and_verify.py"]
import importlib.util
spec = importlib.util.spec_from_file_location(
    "cav", os.path.join({str(os.getcwd())!r}, "scripts/convert_and_verify.py"))
cav = importlib.util.module_from_spec(spec)
spec.loader.exec_module(cav)
import yaml
with open({str(model_dir / "config.yaml")!r}) as f:
    ycfg = yaml.safe_load(f)
cfg, warnings = cav.build_config_from_reference(ycfg)
assert any("bogus_knob" in w for w in warnings), warnings
assert cfg.gpt.model_dim == {GPT_CFG.model_dim}
assert cfg.s2mel.dit.hidden_dim == {S2_CFG.dit.hidden_dim}
assert cfg.semantic_codec.codebook_size == {REP_CFG.codebook_size}
# tiny vocoder/campplus dims aren't part of the reference YAML surface
from voice_tts_tpu.config import BigVGANConfig, CAMPPlusConfig
cfg.vocoder = BigVGANConfig(
    num_mels={VOC_CFG.num_mels}, upsample_rates={tuple(VOC_CFG.upsample_rates)},
    upsample_kernel_sizes={tuple(VOC_CFG.upsample_kernel_sizes)},
    upsample_initial_channel={VOC_CFG.upsample_initial_channel},
    resblock_kernel_sizes={tuple(VOC_CFG.resblock_kernel_sizes)},
    resblock_dilation_sizes={tuple(VOC_CFG.resblock_dilation_sizes)})
cfg.campplus = CAMPPlusConfig(feat_dim=16, embedding_size=24,
                              growth_rate=32, bn_size=4, init_channels=128)
cfg.s2mel.gpt_dim = {S2_CFG.gpt_dim}
cfg.s2mel.gpt_layer_hidden = {tuple(S2_CFG.gpt_layer_hidden)}
cfg.s2mel.gpt_layer_out = {S2_CFG.gpt_layer_out}

paths = {{
    "gpt": {str(model_dir / "gpt.pth")!r},
    "s2mel": {str(model_dir / "s2mel.pth")!r},
    "vocoder": {str(tmp_path / "bigvgan_generator.pt")!r},
    "repcodec": {str(tmp_path / "semantic_codec.pth")!r},
    "campplus": {str(tmp_path / "campplus.bin")!r},
}}
from voice_tts_tpu.utils.checkpoint import load_state_dict, to_tree
params, ok = {{}}, True
report = {{}}
for fam, path in paths.items():
    sd = load_state_dict(path)
    cov = cav.coverage_report(fam, sd, cav.FAMILY_RENAMERS[fam](cfg))
    diff = cav.structure_diff(cov["converted"], cav.eval_shape_tree(fam, cfg))
    bad = cov["unmatched"] + diff["missing"] + diff["mismatched"] + diff["extra"]
    if bad:
        print(fam, "PROBLEMS:", bad[:10])
        ok = False
    params[fam] = {{"params": to_tree(cov["converted"])}}
assert ok, "key coverage / structure problems"
from tests.verify_stages import run_stage_parity
errs = run_stage_parity(cfg, paths, params)
print(json.dumps(errs))
assert set(errs) == set(paths), errs
assert all(e < 1e-3 for e in errs.values()), errs
print("SMOKE_OK")
""")
    proc = subprocess.run([sys.executable, str(driver)], cwd=os.getcwd(),
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    assert "SMOKE_OK" in proc.stdout


def test_load_state_dict_nested_net_and_ema(tmp_path):
    """The REAL s2mel checkpoint format is module-keyed
    (`state["net"][module][param]`, reference `commons.py:568-589`), with an
    optional positional EMA shadow (`state["ema"][module][0]`).  The loader
    must flatten it to the `models.<module>.<param>` names the renamer
    expects, and `load_ema=True` must substitute the shadow weights."""
    import pytest

    from tests.reference_oracle import reference_available
    if not reference_available():
        pytest.skip("reference repo not mounted")

    import numpy as np
    import torch
    import tests.test_pipeline_parity as tpp
    from voice_tts_tpu.utils.checkpoint import convert_s2mel, load_state_dict

    (_gpt, ref_s2, _rep, _voc), _params = tpp.stack.__wrapped__()

    flat = {f"models.{k}": v for k, v in ref_s2.state_dict().items()
            if not k.startswith("models.")}
    net = {k: mod.state_dict() for k, mod in ref_s2.models.items()}
    ema = {k: [[t.clone() + 1.0 for n, t in sd.items()
                if "input_pos" not in n]]
           for k, sd in net.items()}
    torch.save({"net": net, "ema": ema, "epoch": 3}, tmp_path / "s2mel.pth")

    sd = load_state_dict(str(tmp_path / "s2mel.pth"))
    ref_flat = {f"models.{mk}.{pk}": pv.numpy()
                for mk, msd in net.items() for pk, pv in msd.items()}
    assert set(sd) == set(ref_flat)
    for k in sd:
        np.testing.assert_array_equal(sd[k], ref_flat[k])
    # conversion of the nested form == conversion of the flat form
    c_nested = convert_s2mel(
        sd,
        num_sampling_ratios=tpp.S2_CFG.length_regulator.num_sampling_ratios)
    assert c_nested["params"]

    sd_ema = load_state_dict(str(tmp_path / "s2mel.pth"), load_ema=True)
    moved = sum(
        not np.array_equal(sd_ema[k], sd[k]) for k in sd
        if "input_pos" not in k)
    assert moved == sum(1 for k in sd if "input_pos" not in k)
    for k in sd:
        if "input_pos" not in k:
            np.testing.assert_allclose(sd_ema[k], sd[k] + 1.0, rtol=1e-6)


import pytest  # noqa: E402


@pytest.mark.slow
def test_convert_flagship_dims_gpt(tmp_path):
    """Converter dry run at the published IndexTTS-2 GPT dims (the flagship
    `GPTConfig()` defaults: 24 layers / 1280 dim / 20 heads / conformer
    output 512 / 12000 text tokens) — VERDICT r2 item 10: exercise the
    renamer at TRUE shapes (including the DDP 'module.' prefix real
    artifacts can carry) before real artifacts appear.  Checks zero
    unmatched source keys, a clean structure diff vs eval_shape init, and
    get_conditioning parity on real-width inputs."""
    import numpy as np
    import torch

    from tests.reference_oracle import (install_reference_gpt,
                                        reference_available)
    if not reference_available():
        pytest.skip("reference repo not mounted")
    install_reference_gpt()
    import jax
    import jax.numpy as jnp
    from indextts.gpt.model_v2 import UnifiedVoice as RefUV

    from voice_tts_tpu.config import GPTConfig
    from voice_tts_tpu.models.gpt.unified_voice import UnifiedVoice
    from voice_tts_tpu.utils.checkpoint import (convert_unified_voice,
                                                strip_ddp_prefix,
                                                unified_voice_renamer)

    cfg = GPTConfig()
    cm, em = cfg.condition_module, cfg.emo_condition_module
    torch.manual_seed(0)
    ref = RefUV(
        layers=cfg.layers, model_dim=cfg.model_dim, heads=cfg.heads,
        max_text_tokens=cfg.max_text_tokens,
        max_mel_tokens=cfg.max_mel_tokens,
        number_text_tokens=cfg.number_text_tokens,
        number_mel_codes=cfg.number_mel_codes,
        start_mel_token=cfg.start_mel_token,
        stop_mel_token=cfg.stop_mel_token,
        condition_num_latent=cfg.condition_num_latent,
        condition_type="conformer_perceiver",
        condition_module={
            "output_size": cm.output_size, "linear_units": cm.linear_units,
            "attention_heads": cm.attention_heads,
            "num_blocks": cm.num_blocks, "input_layer": cm.input_layer,
            "perceiver_mult": cm.perceiver_mult},
        emo_condition_module={
            "output_size": em.output_size, "linear_units": em.linear_units,
            "attention_heads": em.attention_heads,
            "num_blocks": em.num_blocks, "input_layer": em.input_layer,
            "perceiver_mult": em.perceiver_mult},
    ).eval()

    # a real artifact may carry DDP prefixes — the loader strips them
    sd = {"module." + k: v.detach().numpy()
          for k, v in ref.state_dict().items()}
    sd = strip_ddp_prefix(sd)

    # every source key must be matched (converted or deliberately dropped)
    renamer = unified_voice_renamer()
    unmatched = []
    for k in sd:
        try:
            renamer(k)
        except KeyError:
            unmatched.append(k)
    assert unmatched == [], unmatched[:10]

    params = convert_unified_voice(sd)

    # structure diff vs a fresh init at the same config
    model = UnifiedVoice(cfg)
    spk = jnp.zeros((1, 30, 1024), jnp.float32)
    emo = jnp.zeros((1, 30, 1024), jnp.float32)
    init_shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), spk,
                           method=UnifiedVoice.get_conditioning))
    flat_init = {"/".join(str(p.key) for p in path): leaf.shape
                 for path, leaf in
                 jax.tree_util.tree_flatten_with_path(init_shapes)[0]}
    flat_conv = {"/".join(str(p.key) for p in path): np.asarray(leaf).shape
                 for path, leaf in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    for k, shape in flat_init.items():
        assert k in flat_conv, f"converted tree missing {k}"
        assert flat_conv[k] == shape, (k, flat_conv[k], shape)

    # stagewise parity at real widths: conditioning + emovec
    rng = np.random.default_rng(1)
    spk_np = rng.normal(size=(1, 30, 1024)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref_cond = ref.get_conditioning(
            torch.from_numpy(spk_np).transpose(1, 2),
            torch.tensor([30])).numpy()
    ours = np.asarray(model.apply(
        params, jnp.asarray(spk_np), jnp.asarray([30], dtype=jnp.int32),
        method=UnifiedVoice.get_conditioning))
    assert ours.shape == ref_cond.shape == (1, 32, cfg.model_dim)
    np.testing.assert_allclose(ours, ref_cond, atol=5e-4, rtol=1e-3)


def test_quality_gate_on_params_tree():
    """`utils/quality_gate.run_quality_gate` (the onboarding chain's step 5)
    runs on an arbitrary UnifiedVoice params tree: int8 teacher-forced KL is
    tiny; the schemes are ranked int8 << int4 variants."""
    import functools

    import jax
    import jax.numpy as jnp

    from voice_tts_tpu.config import TTSConfig
    from voice_tts_tpu.models.gpt.unified_voice import UnifiedVoice
    from voice_tts_tpu.utils.quality_gate import run_quality_gate

    cfg = TTSConfig.tiny().gpt
    model = UnifiedVoice(cfg)
    params = jax.jit(functools.partial(
        model.init, method=UnifiedVoice.init_all))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 6, cfg.condition_module.input_size)),
        jnp.zeros((1, 6, cfg.emo_condition_module.input_size)),
        jnp.ones((1, 8), jnp.int32), jnp.asarray([8]),
        jnp.zeros((1, 6), jnp.int32), jnp.asarray([6]))

    res = run_quality_gate(cfg, params, steps=4, prompts=1, interpret=True)
    tf = res["teacher_forced"]
    assert set(tf) == {"int8", "int4", "int4_i8sh", "int4_gwide",
                       "int8_rofold"}
    # the folded int8 readout adds head-quantization on top of int8's
    # trunk delta, but stays well under the int4 schemes
    assert tf["int8_rofold"]["kl_mean"] >= tf["int8"]["kl_mean"]
    for row in tf.values():
        assert np.isfinite(row["kl_mean"]) and row["kl_mean"] >= 0
    # int8 must be (much) closer to the bf16 trajectory than int4
    assert tf["int8"]["kl_mean"] <= tf["int4"]["kl_mean"]
    # i8sh is the same quantization as g128 int4 — bit-identical logits
    assert tf["int4_i8sh"]["kl_mean"] == tf["int4"]["kl_mean"]
    assert len(res["free_running"]) == 1


def test_onboard_bench_step_from_artifacts(tmp_path):
    """The onboarding chain's final step (serving-profile engine from the
    written artifacts + warm RTF) works on a saved artifact dir."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine import _tiny_engine

    from voice_tts_tpu.engine import TTSEngine

    engine = _tiny_engine()
    save_artifacts(str(tmp_path), engine.cfg, engine.params,
                   {"w2v_mean": np.asarray(engine.w2v_mean),
                    "w2v_std": np.asarray(engine.w2v_std)})
    served = TTSEngine.from_artifacts(str(tmp_path), profile="serving")
    assert served.fused_pack is not None

    from voice_tts_tpu.audio import encode_wav_int16
    sr = served.cfg.engine.sample_rate
    t = np.arange(int(0.4 * sr)) / sr
    prompt = encode_wav_int16(
        (0.4 * np.sin(2 * np.pi * 220 * t)) * 32767, sr)
    res = served.infer(prompt, "hello onboard.", None)
    assert len(res.wav) > 0 and res.metrics["rtf"] > 0
