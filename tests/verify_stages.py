"""Stagewise torch-vs-JAX parity on REAL checkpoint files.

Used by `scripts/convert_and_verify.py --torch-parity`: for each family with
a checkpoint on disk, instantiate the reference torch module at the mapped
config dims, load the real weights, and compare one small random forward
against the flax module with the converted weights.  Reference construction
mirrors `infer_v2.py:77-176`.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tests.reference_oracle import (
    RefArgs, install_reference_gpt, install_reference_s2mel,
)


def _gpt_parity(cfg, path, params):
    import torch
    install_reference_gpt()
    from indextts.gpt.model_v2 import UnifiedVoice as RefUV

    from voice_tts_tpu.models.gpt import UnifiedVoice
    from voice_tts_tpu.utils.checkpoint import load_state_dict

    g, cm, em = cfg.gpt, cfg.gpt.condition_module, cfg.gpt.emo_condition_module
    ref = RefUV(
        layers=g.layers, model_dim=g.model_dim, heads=g.heads,
        max_text_tokens=g.max_text_tokens, max_mel_tokens=g.max_mel_tokens,
        number_text_tokens=g.number_text_tokens,
        number_mel_codes=g.number_mel_codes, start_mel_token=g.start_mel_token,
        stop_mel_token=g.stop_mel_token, types=g.types,
        condition_num_latent=g.condition_num_latent,
        condition_type=g.condition_type,
        condition_module={
            "output_size": cm.output_size, "linear_units": cm.linear_units,
            "attention_heads": cm.attention_heads, "num_blocks": cm.num_blocks,
            "input_layer": cm.input_layer, "perceiver_mult": cm.perceiver_mult},
        emo_condition_module={
            "output_size": em.output_size, "linear_units": em.linear_units,
            "attention_heads": em.attention_heads, "num_blocks": em.num_blocks,
            "input_layer": em.input_layer, "perceiver_mult": em.perceiver_mult},
    )
    sd = load_state_dict(path)
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v))
                         for k, v in sd.items()}, strict=False)
    ref.eval()

    rng = np.random.default_rng(0)
    spk = (rng.normal(size=(1, 19, cm.input_size)) * 0.3).astype(np.float32)
    with torch.no_grad():
        ref_cond = ref.get_conditioning(torch.from_numpy(spk).transpose(1, 2),
                                        torch.tensor([19])).numpy()
    model = UnifiedVoice(g)
    ours = np.asarray(model.apply(params, jnp.asarray(spk),
                                  jnp.asarray([19], dtype=jnp.int32),
                                  method=UnifiedVoice.get_conditioning))
    return float(np.abs(ours - ref_cond).max())


def _s2mel_parity(cfg, path, params):
    import torch
    install_reference_s2mel()
    from indextts.s2mel.modules.commons import MyModel

    from voice_tts_tpu.models.s2mel import S2Mel
    from voice_tts_tpu.utils.checkpoint import load_state_dict

    d, w, lr = cfg.s2mel.dit, cfg.s2mel.wavenet, cfg.s2mel.length_regulator
    args = RefArgs(
        dit_type="DiT", reg_loss_type="l2",
        DiT=RefArgs(hidden_dim=d.hidden_dim, depth=d.depth,
                    num_heads=d.num_heads, in_channels=d.in_channels,
                    content_dim=d.content_dim,
                    content_codebook_size=lr.codebook_size,
                    content_type="continuous", is_causal=d.is_causal,
                    long_skip_connection=d.long_skip_connection,
                    final_layer_type=d.final_layer_type, style_condition=True,
                    class_dropout_prob=0.0),
        style_encoder=RefArgs(dim=d.style_dim),
        wavenet=RefArgs(hidden_dim=w.hidden_dim, kernel_size=w.kernel_size,
                        dilation_rate=w.dilation_rate, num_layers=w.num_layers,
                        p_dropout=0.0, style_condition=True),
        length_regulator=RefArgs(channels=lr.channels,
                                 sampling_ratios=[1] * lr.num_sampling_ratios,
                                 is_discrete=False,
                                 in_channels=cfg.semantic_codec.hidden_size,
                                 content_codebook_size=lr.codebook_size),
    )
    ref = MyModel(args, use_gpt_latent=True)
    # the reference hard-codes gpt_layer at 1280->256->128->1024
    # (`commons.py:411`); rebuild it at the mapped dims so non-flagship
    # checkpoints (e.g. tiny smoke fixtures) load too
    dims = ([cfg.s2mel.gpt_dim] + list(cfg.s2mel.gpt_layer_hidden)
            + [cfg.s2mel.gpt_layer_out])
    ref.models["gpt_layer"] = torch.nn.Sequential(
        *[torch.nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])])
    sd = load_state_dict(path)
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v))
                         for k, v in sd.items()}, strict=False)
    ref.eval()
    ref.models["cfm"].estimator.setup_caches(2, 64)

    rng = np.random.default_rng(1)
    b, t = 1, 11
    x = rng.normal(size=(b, d.in_channels, t)).astype(np.float32)
    px = rng.normal(size=(b, d.in_channels, t)).astype(np.float32)
    style = rng.normal(size=(b, d.style_dim)).astype(np.float32)
    mu = rng.normal(size=(b, t, d.content_dim)).astype(np.float32)
    tt = np.array([0.4], dtype=np.float32)
    with torch.no_grad():
        ref_v = ref.models["cfm"].estimator(
            torch.from_numpy(x), torch.from_numpy(px), torch.tensor([t]),
            torch.from_numpy(tt), torch.from_numpy(style),
            torch.from_numpy(mu)).numpy()
    model = S2Mel(cfg.s2mel)
    ours = np.asarray(model.apply(params, jnp.asarray(x), jnp.asarray(px),
                                  jnp.asarray([t]), jnp.asarray(tt),
                                  jnp.asarray(style), jnp.asarray(mu),
                                  method=S2Mel.velocity))
    return float(np.abs(ours - ref_v).max())


def _vocoder_parity(cfg, path, params):
    import torch
    from tests.reference_oracle import install_reference
    install_reference()
    from indextts.s2mel.modules.bigvgan.bigvgan import AttrDict
    from indextts.s2mel.modules.bigvgan.bigvgan import BigVGAN as RefBigVGAN

    from voice_tts_tpu.models.vocoder import BigVGAN
    from voice_tts_tpu.utils.checkpoint import load_state_dict

    v = cfg.vocoder
    h = AttrDict({
        "resblock": "1", "upsample_rates": list(v.upsample_rates),
        "upsample_kernel_sizes": list(v.upsample_kernel_sizes),
        "upsample_initial_channel": v.upsample_initial_channel,
        "resblock_kernel_sizes": list(v.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(x) for x in v.resblock_dilation_sizes],
        "activation": v.activation, "snake_logscale": v.snake_logscale,
        "use_bias_at_final": v.use_bias_at_final,
        "use_tanh_at_final": v.use_tanh_at_final, "num_mels": v.num_mels,
    })
    ref = RefBigVGAN(h)
    sd = load_state_dict(path)
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v_))
                         for k, v_ in sd.items()}, strict=False)
    ref.eval()
    rng = np.random.default_rng(2)
    mel = rng.normal(size=(1, v.num_mels, 9)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(mel)).numpy()
    ours = np.asarray(BigVGAN(v).apply(params, mel))
    return float(np.abs(ours - ref_out).max())


def _repcodec_parity(cfg, path, params):
    import torch
    from tests.reference_oracle import install_reference
    install_reference()
    from indextts.utils.maskgct.models.codec.kmeans.repcodec_model import (
        RepCodec as RefRepCodec,
    )

    from voice_tts_tpu.models.conditioning import RepCodec
    from voice_tts_tpu.utils.checkpoint import load_state_dict

    c = cfg.semantic_codec
    ref = RefRepCodec(codebook_size=c.codebook_size, hidden_size=c.hidden_size,
                      codebook_dim=c.codebook_dim, vocos_dim=c.vocos_dim,
                      vocos_intermediate_dim=c.vocos_intermediate_dim,
                      vocos_num_layers=c.vocos_num_layers,
                      downsample_scale=c.downsample_scale)
    sd = load_state_dict(path)
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v))
                         for k, v in sd.items()}, strict=False)
    ref.eval()
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 10, c.hidden_size)).astype(np.float32)
    with torch.no_grad():
        _, ref_emb = ref.quantize(torch.from_numpy(x))
    idx, emb = RepCodec(c).apply(params, jnp.asarray(x))
    return float(np.abs(np.asarray(emb) - ref_emb.numpy()).max())


def _campplus_parity(cfg, path, params):
    import torch
    from tests.reference_oracle import install_reference
    install_reference()
    from indextts.s2mel.modules.campplus.DTDNN import CAMPPlus as RefCAMPPlus

    from voice_tts_tpu.models.conditioning import CAMPPlus
    from voice_tts_tpu.utils.checkpoint import load_state_dict

    c = cfg.campplus
    ref = RefCAMPPlus(feat_dim=c.feat_dim, embedding_size=c.embedding_size)
    sd = load_state_dict(path)
    ref.load_state_dict({k: torch.from_numpy(np.asarray(v))
                         for k, v in sd.items()}, strict=False)
    ref.eval()
    rng = np.random.default_rng(4)
    fb = rng.normal(size=(1, 24, c.feat_dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(fb)).numpy()
    ours = np.asarray(CAMPPlus(c).apply(params, jnp.asarray(fb),
                                        jnp.asarray([24])))
    return float(np.abs(ours - ref_out).max())


STAGES = {
    "gpt": _gpt_parity,
    "s2mel": _s2mel_parity,
    "vocoder": _vocoder_parity,
    "repcodec": _repcodec_parity,
    "campplus": _campplus_parity,
}


def run_stage_parity(cfg, paths: dict, params: dict) -> dict:
    """Per-family max abs deviation torch(real weights) vs flax(converted)."""
    out = {}
    for fam, fn in STAGES.items():
        if fam in paths and fam in params:
            out[fam] = fn(cfg, paths[fam], params[fam])
    return out
