"""Chained full-pipeline parity vs the torch reference (VERDICT r1 item 5).

Per-stage parity tests can cancel index-drift bugs that only surface when the
stages are chained the way `infer_v2.py:616-749` chains them.  This harness
wires the reference torch modules end-to-end on shared converted weights with
FORCED identical codes and identical CFM noise:

    conditioning -> merge_emovec -> teacher-forced GPT latent -> gpt_layer
    -> vq2emb(codes) + latent -> length regulator (x1.72) ->
    [prompt_condition ; cond] -> CFM Euler solve (cfg 0.7) -> slice ->
    BigVGAN -> waveform

and asserts the driver's parity budget: final mel <= 1e-2 (BASELINE config
#4) plus waveform closeness.  The JAX side runs through the SAME bucketed
helpers the engine's `s2mel_body` uses (static code/mel/prompt buckets with
dynamic valid lengths) so the bucket math is what's under test.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voice_tts_tpu.config import (
    BigVGANConfig, ConformerConfig, DiTConfig, GPTConfig,
    LengthRegulatorConfig, RepCodecConfig, S2MelConfig, WaveNetConfig,
)
from voice_tts_tpu.models.conditioning import RepCodec
from voice_tts_tpu.models.conditioning.repcodec import repcodec_vq2emb
from voice_tts_tpu.models.gpt import UnifiedVoice
from voice_tts_tpu.models.s2mel import S2Mel
from voice_tts_tpu.models.s2mel.cfm import cfm_inference
from voice_tts_tpu.models.s2mel.s2mel import (
    assemble_condition, place_prompt_mel, slice_generated,
)
from voice_tts_tpu.models.vocoder import BigVGAN
from voice_tts_tpu.utils.checkpoint import (
    convert_bigvgan, convert_repcodec, convert_s2mel, convert_unified_voice,
)

from tests.reference_oracle import (
    RefArgs, install_reference_gpt, install_reference_s2mel,
    reference_available,
)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference repo not mounted")

# --- one consistent tiny dimension set across every stage ------------------
N_MELS = 8            # mel bands (DiT in_channels == vocoder num_mels)
SEM_DIM = 32          # semantic dim: repcodec hidden == gpt_layer_out
CONTENT_DIM = 16      # regulator channels == DiT content_dim
STYLE_DIM = 12
GPT_DIM = 64
CODEBOOK = 64         # semantic codebook; GPT mel vocab = 64 + start/stop
MEL_SCALE = 1.72      # reference `infer_v2.py:719`
CFM_STEPS = 6
CFG_RATE = 0.7

GPT_CFG = GPTConfig(
    layers=2, model_dim=GPT_DIM, heads=4, max_text_tokens=32,
    max_mel_tokens=48, number_text_tokens=40, number_mel_codes=66,
    start_mel_token=64, stop_mel_token=65, condition_num_latent=4,
    emo_dim=1024,
    condition_module=ConformerConfig(
        input_size=1024, output_size=32, attention_heads=2, linear_units=48,
        num_blocks=2, input_layer="conv2d2", perceiver_mult=2),
    emo_condition_module=ConformerConfig(
        input_size=1024, output_size=32, attention_heads=2, linear_units=48,
        num_blocks=1, input_layer="conv2d2", perceiver_mult=2),
)

S2_CFG = S2MelConfig(
    dit=DiTConfig(hidden_dim=32, depth=2, num_heads=4, in_channels=N_MELS,
                  content_dim=CONTENT_DIM, style_dim=STYLE_DIM,
                  block_size=256),
    wavenet=WaveNetConfig(hidden_dim=32, kernel_size=5, dilation_rate=1,
                          num_layers=2),
    length_regulator=LengthRegulatorConfig(channels=CONTENT_DIM,
                                           num_sampling_ratios=2,
                                           codebook_size=CODEBOOK,
                                           n_codebooks=1),
    gpt_dim=GPT_DIM, gpt_layer_hidden=(16, 16), gpt_layer_out=SEM_DIM,
    mel_scale_factor=MEL_SCALE,
)

REP_CFG = RepCodecConfig(codebook_size=CODEBOOK, hidden_size=SEM_DIM,
                         codebook_dim=8, vocos_dim=16,
                         vocos_intermediate_dim=32, vocos_num_layers=2)

VOC_CFG = BigVGANConfig(
    num_mels=N_MELS, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    upsample_initial_channel=32, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)
HOP = 16  # total vocoder upsampling (4 * 4)


@pytest.fixture(scope="module")
def stack():
    """All four torch reference models (tiny dims, shared rng) + converted
    JAX parameter trees."""
    install_reference_gpt()
    install_reference_s2mel()
    import torch
    from indextts.gpt.model_v2 import UnifiedVoice as RefUV
    from indextts.s2mel.modules.commons import MyModel
    from indextts.utils.maskgct.models.codec.kmeans.repcodec_model import (
        RepCodec as RefRepCodec,
    )
    from indextts.s2mel.modules.bigvgan.bigvgan import AttrDict
    from indextts.s2mel.modules.bigvgan.bigvgan import BigVGAN as RefBigVGAN

    torch.manual_seed(0)
    cm, em = GPT_CFG.condition_module, GPT_CFG.emo_condition_module
    ref_gpt = RefUV(
        layers=GPT_CFG.layers, model_dim=GPT_CFG.model_dim,
        heads=GPT_CFG.heads, max_text_tokens=GPT_CFG.max_text_tokens,
        max_mel_tokens=GPT_CFG.max_mel_tokens,
        number_text_tokens=GPT_CFG.number_text_tokens,
        number_mel_codes=GPT_CFG.number_mel_codes,
        start_mel_token=GPT_CFG.start_mel_token,
        stop_mel_token=GPT_CFG.stop_mel_token,
        condition_num_latent=GPT_CFG.condition_num_latent,
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

    d = S2_CFG.dit
    args = RefArgs(
        dit_type="DiT", reg_loss_type="l2",
        DiT=RefArgs(hidden_dim=d.hidden_dim, depth=d.depth,
                    num_heads=d.num_heads, in_channels=d.in_channels,
                    content_dim=d.content_dim, content_codebook_size=CODEBOOK,
                    content_type="continuous", is_causal=d.is_causal,
                    long_skip_connection=d.long_skip_connection,
                    final_layer_type="wavenet", style_condition=True,
                    class_dropout_prob=0.0),
        style_encoder=RefArgs(dim=d.style_dim),
        wavenet=RefArgs(hidden_dim=S2_CFG.wavenet.hidden_dim,
                        kernel_size=S2_CFG.wavenet.kernel_size,
                        dilation_rate=S2_CFG.wavenet.dilation_rate,
                        num_layers=S2_CFG.wavenet.num_layers, p_dropout=0.0,
                        style_condition=True),
        length_regulator=RefArgs(channels=CONTENT_DIM,
                                 sampling_ratios=[1, 1], is_discrete=False,
                                 in_channels=SEM_DIM,
                                 content_codebook_size=CODEBOOK),
    )
    ref_s2 = MyModel(args, use_gpt_latent=True)
    # the reference hard-codes gpt_layer at 1280->256->128->1024
    # (`commons.py:411`); swap in the tiny-dim equivalent (same Sequential
    # structure, so the converter's `models.gpt_layer.{i}` rules apply)
    ref_s2.models["gpt_layer"] = torch.nn.Sequential(
        torch.nn.Linear(GPT_DIM, 16), torch.nn.Linear(16, 16),
        torch.nn.Linear(16, SEM_DIM))
    ref_s2.eval()
    ref_s2.models["cfm"].estimator.setup_caches(2, 64)

    ref_rep = RefRepCodec(codebook_size=CODEBOOK, hidden_size=SEM_DIM,
                          codebook_dim=8, vocos_dim=16,
                          vocos_intermediate_dim=32,
                          vocos_num_layers=2).eval()

    h = AttrDict({
        "resblock": "1", "upsample_rates": list(VOC_CFG.upsample_rates),
        "upsample_kernel_sizes": list(VOC_CFG.upsample_kernel_sizes),
        "upsample_initial_channel": VOC_CFG.upsample_initial_channel,
        "resblock_kernel_sizes": list(VOC_CFG.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(x) for x
                                    in VOC_CFG.resblock_dilation_sizes],
        "activation": VOC_CFG.activation,
        "snake_logscale": VOC_CFG.snake_logscale,
        "use_bias_at_final": VOC_CFG.use_bias_at_final,
        "use_tanh_at_final": VOC_CFG.use_tanh_at_final,
        "num_mels": VOC_CFG.num_mels,
    })
    ref_voc = RefBigVGAN(h)
    with torch.no_grad():
        for name, p in ref_voc.named_parameters():
            if name.endswith("alpha") or name.endswith("beta"):
                p.copy_(torch.randn_like(p) * 0.3)
    ref_voc.eval()

    def sd(m):
        return {k: v.detach().numpy() for k, v in m.state_dict().items()}

    params = {
        "gpt": convert_unified_voice(sd(ref_gpt)),
        "s2mel": convert_s2mel(sd(ref_s2), num_sampling_ratios=2),
        "repcodec": convert_repcodec(sd(ref_rep)),
        "vocoder": convert_bigvgan(sd(ref_voc)),
    }
    return (ref_gpt, ref_s2, ref_rep, ref_voc), params


def test_chained_pipeline_parity(stack):
    """Reference chain (`infer_v2.py:629-735`) vs the bucketed JAX chain on
    forced codes + shared noise: final mel within the driver's 1e-2 budget,
    waveform close."""
    import torch
    (ref_gpt, ref_s2, ref_rep, ref_voc), params = stack

    rng = np.random.default_rng(11)
    spk = (rng.normal(size=(1, 21, 1024)) * 0.3).astype(np.float32)
    emo = (rng.normal(size=(1, 17, 1024)) * 0.3).astype(np.float32)
    text = rng.integers(2, 30, size=(1, 9)).astype(np.int32)
    codes = rng.integers(0, CODEBOOK - 4, size=(1, 13)).astype(np.int32)
    code_len = 13
    emo_alpha = 0.65

    prompt_len = 6
    ref_mel = (rng.normal(size=(1, N_MELS, prompt_len)) * 0.5
               ).astype(np.float32)
    prompt_condition = (rng.normal(size=(1, prompt_len, CONTENT_DIM)) * 0.5
                        ).astype(np.float32)
    style = (rng.normal(size=(1, STYLE_DIM)) * 0.5).astype(np.float32)

    target_len = int(code_len * MEL_SCALE)  # reference: (lens*1.72).long()

    # --- engine-style static buckets (JAX side)
    cbucket = 16                      # codes padded 13 -> 16
    mbucket = 48                      # generated mel bucket (>= 22)
    pbucket = 8                       # prompt frames padded 6 -> 8
    total_max = pbucket + mbucket

    # shared CFM noise: JAX draws positionally over the padded buffer; the
    # torch exact-size run reads the same positions [0, prompt+target)
    noise = rng.normal(size=(1, N_MELS, total_max)).astype(np.float32)
    t_total = prompt_len + target_len

    # ------------------------------------------------------------ torch ---
    with torch.no_grad():
        spk_t, emo_t = torch.from_numpy(spk), torch.from_numpy(emo)
        lens21, lens17 = torch.tensor([21]), torch.tensor([17])
        emovec_t = ref_gpt.merge_emovec(spk_t, emo_t, lens21, lens17,
                                        alpha=emo_alpha)
        latent_t = ref_gpt(
            spk_t, torch.from_numpy(text.astype(np.int64)), torch.tensor([9]),
            torch.from_numpy(codes.astype(np.int64)),
            torch.tensor([code_len]), emo_t,
            cond_mel_lengths=lens21, emo_cond_mel_lengths=lens17,
            emo_vec=emovec_t, use_speed=torch.zeros(1).long(),
            do_spk_cond=True)
        latent_t = ref_s2.models["gpt_layer"](latent_t)
        s_infer = ref_rep.quantizer.vq2emb(
            torch.from_numpy(codes.astype(np.int64)).unsqueeze(1))
        s_infer = s_infer.transpose(1, 2) + latent_t
        cond_t = ref_s2.models["length_regulator"](
            s_infer, ylens=torch.tensor([target_len]), n_quantizers=3,
            f0=None)[0]
        cat_t = torch.cat([torch.from_numpy(prompt_condition), cond_t], dim=1)
        t_span = torch.linspace(0, 1, CFM_STEPS + 1)
        z = torch.from_numpy(noise[:, :, :t_total].copy())
        mel_full_t = ref_s2.models["cfm"].solve_euler(
            z, torch.tensor([t_total]), torch.from_numpy(ref_mel), cat_t,
            torch.from_numpy(style), None, t_span,
            inference_cfg_rate=CFG_RATE)
        vc_t = mel_full_t[:, :, prompt_len:]
        wav_t = ref_voc(vc_t.float()).numpy()
    mel_ref = vc_t.numpy()

    # -------------------------------------------------------------- JAX ---
    uv = UnifiedVoice(GPT_CFG)
    s2 = S2Mel(S2_CFG)

    codes_pad = np.zeros((1, cbucket), np.int32)
    codes_pad[0, :code_len] = codes[0]
    pc_pad = np.zeros((1, pbucket, CONTENT_DIM), np.float32)
    pc_pad[:, :prompt_len] = prompt_condition
    ref_mel_pad = np.zeros((1, N_MELS, pbucket), np.float32)
    ref_mel_pad[:, :, :prompt_len] = ref_mel

    gp = params["gpt"]
    cond_lat = uv.apply(gp, jnp.asarray(spk), jnp.asarray([21]),
                        method=UnifiedVoice.get_conditioning)
    base = uv.apply(gp, jnp.asarray(spk), jnp.asarray([21]),
                    method=UnifiedVoice.get_emovec)
    emo_v = uv.apply(gp, jnp.asarray(emo), jnp.asarray([17]),
                     method=UnifiedVoice.get_emovec)
    emovec = base + emo_alpha * (emo_v - base)
    np.testing.assert_allclose(np.asarray(emovec), emovec_t.numpy(),
                               atol=5e-4, rtol=1e-3)

    latent = uv.apply(gp, cond_lat, emovec, jnp.asarray(text),
                      jnp.asarray([9]), jnp.asarray(codes_pad),
                      jnp.asarray([code_len]))

    latent2 = s2.apply(params["s2mel"], latent, method=S2Mel.gpt_layer)
    s_inf = repcodec_vq2emb(params["repcodec"], jnp.asarray(codes_pad)) + latent2
    np.testing.assert_allclose(np.asarray(s_inf)[:, :code_len],
                               s_infer.numpy(), atol=2e-3, rtol=1e-2)

    cond = s2.apply(params["s2mel"], s_inf, jnp.asarray([code_len]),
                    jnp.asarray([target_len]), mbucket, method=S2Mel.regulate)
    np.testing.assert_allclose(np.asarray(cond)[:, :target_len],
                               cond_t.numpy(), atol=2e-3, rtol=1e-2)

    cat, total_len = assemble_condition(
        jnp.asarray(pc_pad), jnp.asarray([prompt_len]), cond,
        jnp.asarray([target_len]), total_max)
    prompt_x = place_prompt_mel(jnp.asarray(ref_mel_pad),
                                jnp.asarray([prompt_len]), total_max)

    def dit_apply(p, *a):
        return s2.apply(p, *a, method=S2Mel.velocity)

    mel_full = cfm_inference(dit_apply, params["s2mel"], cat, total_len,
                             prompt_x, jnp.asarray([prompt_len]),
                             jnp.asarray(style), None, CFM_STEPS, CFG_RATE,
                             noise=jnp.asarray(noise))
    mel = slice_generated(mel_full, jnp.asarray([prompt_len]), mbucket)
    mel_np = np.asarray(mel)[:, :, :target_len]

    # the driver's parity north star: final mel <= 1e-2 (BASELINE config #4).
    # With WN reflect_fill (exact-length boundary semantics inside the padded
    # bucket) the chain is float-exact; without it this read 6.1e-2.
    err = np.abs(mel_np - mel_ref).max()
    assert err <= 1e-2, f"chained mel parity {err} > 1e-2"
    np.testing.assert_allclose(mel_np, mel_ref, atol=1e-4, rtol=1e-3)

    # vocode like the engine does: padded mel buffer with the tail past
    # target_len zeroed.  The FIRST vocoder conv then sees exactly the
    # exact-length run's zero padding, so everything up to the boundary
    # receptive field is float-exact; the deeper upsampled stages see
    # bias/snake-derived values where the exact-length run zero-pads, so the
    # final ~4 frames (~3 ms at hop 256) carry a bounded boundary artifact —
    # a documented tradeoff of static-bucket vocoding (PARITY.md).
    mel_buf = np.array(mel)  # writable copy (np.asarray of a jax array is RO)
    mel_buf[:, :, target_len:] = 0.0
    voc = BigVGAN(VOC_CFG)
    wav = np.asarray(voc.apply(params["vocoder"], mel_buf))
    edge = 4 * HOP
    n = target_len * HOP
    np.testing.assert_allclose(wav[0, 0, :n - edge], wav_t[0, 0, :n - edge],
                               atol=1e-4, rtol=1e-3)
    tail_err = np.abs(wav[0, 0, n - edge:n] - wav_t[0, 0, n - edge:n]).max()
    assert tail_err <= 0.2, f"wav boundary error {tail_err}"


def test_chained_pipeline_parity_exact_buckets(stack):
    """Same chain with buckets == exact lengths: removes the padding variable
    so a failure here means math drift, not mask/bucket leakage."""
    import torch
    (ref_gpt, ref_s2, ref_rep, ref_voc), params = stack

    rng = np.random.default_rng(21)
    spk = (rng.normal(size=(1, 15, 1024)) * 0.3).astype(np.float32)
    text = rng.integers(2, 30, size=(1, 7)).astype(np.int32)
    codes = rng.integers(0, CODEBOOK - 4, size=(1, 10)).astype(np.int32)
    code_len = 10
    prompt_len = 5
    ref_mel = (rng.normal(size=(1, N_MELS, prompt_len)) * 0.5
               ).astype(np.float32)
    prompt_condition = (rng.normal(size=(1, prompt_len, CONTENT_DIM)) * 0.5
                        ).astype(np.float32)
    style = (rng.normal(size=(1, STYLE_DIM)) * 0.5).astype(np.float32)
    target_len = int(code_len * MEL_SCALE)  # 17
    t_total = prompt_len + target_len
    noise = rng.normal(size=(1, N_MELS, t_total)).astype(np.float32)

    with torch.no_grad():
        spk_t = torch.from_numpy(spk)
        lens = torch.tensor([15])
        emovec_t = ref_gpt.merge_emovec(spk_t, spk_t, lens, lens, alpha=1.0)
        latent_t = ref_gpt(
            spk_t, torch.from_numpy(text.astype(np.int64)), torch.tensor([7]),
            torch.from_numpy(codes.astype(np.int64)),
            torch.tensor([code_len]), spk_t,
            cond_mel_lengths=lens, emo_cond_mel_lengths=lens,
            emo_vec=emovec_t, use_speed=torch.zeros(1).long(),
            do_spk_cond=True)
        latent_t = ref_s2.models["gpt_layer"](latent_t)
        s_infer = ref_rep.quantizer.vq2emb(
            torch.from_numpy(codes.astype(np.int64)).unsqueeze(1))
        s_infer = s_infer.transpose(1, 2) + latent_t
        cond_t = ref_s2.models["length_regulator"](
            s_infer, ylens=torch.tensor([target_len]), n_quantizers=3,
            f0=None)[0]
        cat_t = torch.cat([torch.from_numpy(prompt_condition), cond_t], dim=1)
        t_span = torch.linspace(0, 1, CFM_STEPS + 1)
        mel_full_t = ref_s2.models["cfm"].solve_euler(
            torch.from_numpy(noise.copy()), torch.tensor([t_total]),
            torch.from_numpy(ref_mel), cat_t, torch.from_numpy(style), None,
            t_span, inference_cfg_rate=CFG_RATE)
        vc_t = mel_full_t[:, :, prompt_len:]
        wav_t = ref_voc(vc_t.float()).numpy()

    uv = UnifiedVoice(GPT_CFG)
    s2 = S2Mel(S2_CFG)
    gp = params["gpt"]
    cond_lat = uv.apply(gp, jnp.asarray(spk), jnp.asarray([15]),
                        method=UnifiedVoice.get_conditioning)
    emovec = uv.apply(gp, jnp.asarray(spk), jnp.asarray([15]),
                      method=UnifiedVoice.get_emovec)
    latent = uv.apply(gp, cond_lat, emovec, jnp.asarray(text),
                      jnp.asarray([7]), jnp.asarray(codes),
                      jnp.asarray([code_len]))
    latent2 = s2.apply(params["s2mel"], latent, method=S2Mel.gpt_layer)
    s_inf = repcodec_vq2emb(params["repcodec"], jnp.asarray(codes)) + latent2
    cond = s2.apply(params["s2mel"], s_inf, jnp.asarray([code_len]),
                    jnp.asarray([target_len]), target_len,
                    method=S2Mel.regulate)
    cat, total_len = assemble_condition(
        jnp.asarray(prompt_condition), jnp.asarray([prompt_len]), cond,
        jnp.asarray([target_len]), t_total)
    prompt_x = place_prompt_mel(jnp.asarray(ref_mel),
                                jnp.asarray([prompt_len]), t_total)

    def dit_apply(p, *a):
        return s2.apply(p, *a, method=S2Mel.velocity)

    mel_full = cfm_inference(dit_apply, params["s2mel"], cat, total_len,
                             prompt_x, jnp.asarray([prompt_len]),
                             jnp.asarray(style), None, CFM_STEPS, CFG_RATE,
                             noise=jnp.asarray(noise))
    mel = np.asarray(slice_generated(mel_full, jnp.asarray([prompt_len]),
                                     target_len))
    err = np.abs(mel - vc_t.numpy()).max()
    assert err <= 1e-2, f"chained mel parity {err} > 1e-2"

    voc = BigVGAN(VOC_CFG)
    wav = np.asarray(voc.apply(params["vocoder"], mel))
    np.testing.assert_allclose(wav[0, 0], wav_t[0, 0], atol=5e-3, rtol=5e-2)
