"""s2mel stage parity: DiT velocity, length regulator, gpt_layer, CFM solve."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voice_tts_tpu.config import DiTConfig, LengthRegulatorConfig, S2MelConfig, WaveNetConfig
from voice_tts_tpu.models.s2mel import S2Mel
from voice_tts_tpu.models.s2mel.cfm import cfm_inference
from voice_tts_tpu.utils.checkpoint import convert_s2mel

from tests.reference_oracle import (
    RefArgs, install_reference_s2mel, reference_available,
)

needs_ref = pytest.mark.skipif(not reference_available(),
                               reason="reference repo not mounted")

CFG = S2MelConfig(
    dit=DiTConfig(hidden_dim=32, depth=2, num_heads=4, in_channels=8,
                  content_dim=16, style_dim=12, block_size=256),
    wavenet=WaveNetConfig(hidden_dim=32, kernel_size=5, dilation_rate=1,
                          num_layers=2),
    length_regulator=LengthRegulatorConfig(channels=16, num_sampling_ratios=2,
                                           codebook_size=32, n_codebooks=1),
    gpt_dim=24, gpt_layer_hidden=(256, 128), gpt_layer_out=1024,
)


@pytest.fixture(scope="module")
def ref_model():
    if not reference_available():
        pytest.skip("reference repo not mounted")
    install_reference_s2mel()
    import torch
    from indextts.s2mel.modules.commons import MyModel

    d = CFG.dit
    args = RefArgs(
        dit_type="DiT", reg_loss_type="l2",
        DiT=RefArgs(hidden_dim=d.hidden_dim, depth=d.depth,
                    num_heads=d.num_heads, in_channels=d.in_channels,
                    content_dim=d.content_dim, content_codebook_size=32,
                    content_type="continuous", is_causal=d.is_causal,
                    long_skip_connection=d.long_skip_connection,
                    final_layer_type="wavenet", style_condition=True,
                    class_dropout_prob=0.0),
        style_encoder=RefArgs(dim=d.style_dim),
        wavenet=RefArgs(hidden_dim=CFG.wavenet.hidden_dim,
                        kernel_size=CFG.wavenet.kernel_size,
                        dilation_rate=CFG.wavenet.dilation_rate,
                        num_layers=CFG.wavenet.num_layers, p_dropout=0.0,
                        style_condition=True),
        length_regulator=RefArgs(channels=CFG.length_regulator.channels,
                                 sampling_ratios=[1, 1], is_discrete=False,
                                 in_channels=24, content_codebook_size=32),
    )
    torch.manual_seed(0)
    ref = MyModel(args, use_gpt_latent=True)
    ref.eval()
    ref.models["cfm"].estimator.setup_caches(2, 64)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_s2mel(sd, num_sampling_ratios=2)
    return ref, params


def test_gpt_layer_parity(ref_model):
    import torch
    ref, params = ref_model
    model = S2Mel(CFG)
    x = np.random.default_rng(0).normal(size=(1, 5, 1280)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.models["gpt_layer"](torch.from_numpy(x)).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x), method=S2Mel.gpt_layer))
    np.testing.assert_allclose(ours, ref_out, atol=1e-5, rtol=1e-4)


def test_length_regulator_parity(ref_model):
    import torch
    ref, params = ref_model
    model = S2Mel(CFG)
    rng = np.random.default_rng(1)
    s = rng.normal(size=(1, 9, 24)).astype(np.float32)
    target = 15
    with torch.no_grad():
        ref_out = ref.models["length_regulator"](
            torch.from_numpy(s), ylens=torch.tensor([target]))[0].numpy()

    # exact bucket
    ours = np.asarray(model.apply(
        params, jnp.asarray(s), jnp.asarray([9]), jnp.asarray([target]), target,
        method=S2Mel.regulate))
    np.testing.assert_allclose(ours, ref_out, atol=1e-5, rtol=1e-4)

    # padded bucket: source padded to 12, output bucket 20 -> first 15 match
    s_pad = np.zeros((1, 12, 24), dtype=np.float32)
    s_pad[:, :9] = s
    ours_pad = np.asarray(model.apply(
        params, jnp.asarray(s_pad), jnp.asarray([9]), jnp.asarray([target]), 20,
        method=S2Mel.regulate))
    np.testing.assert_allclose(ours_pad[:, :target], ref_out, atol=1e-5, rtol=1e-4)
    assert np.abs(ours_pad[:, target:]).max() == 0.0


def test_dit_velocity_parity(ref_model):
    import torch
    ref, params = ref_model
    model = S2Mel(CFG)
    rng = np.random.default_rng(2)
    b, t = 2, 13
    x = rng.normal(size=(b, 8, t)).astype(np.float32)
    prompt_x = rng.normal(size=(b, 8, t)).astype(np.float32)
    style = rng.normal(size=(b, 12)).astype(np.float32)
    mu = rng.normal(size=(b, t, 16)).astype(np.float32)
    tt = np.array([0.3, 0.7], dtype=np.float32)

    with torch.no_grad():
        ref_v = ref.models["cfm"].estimator(
            torch.from_numpy(x), torch.from_numpy(prompt_x),
            torch.tensor([t, t]), torch.from_numpy(tt),
            torch.from_numpy(style), torch.from_numpy(mu)).numpy()

    ours = np.asarray(model.apply(
        params, jnp.asarray(x), jnp.asarray(prompt_x), jnp.asarray([t, t]),
        jnp.asarray(tt), jnp.asarray(style), jnp.asarray(mu),
        method=S2Mel.velocity))
    assert ours.shape == ref_v.shape
    np.testing.assert_allclose(ours, ref_v, atol=5e-5, rtol=1e-3)


def test_cfm_solve_parity(ref_model):
    import torch
    ref, params = ref_model
    model = S2Mel(CFG)
    rng = np.random.default_rng(3)
    b, t, prompt_len, steps = 1, 17, 6, 4
    noise = rng.normal(size=(b, 8, t)).astype(np.float32)
    mu = rng.normal(size=(b, t, 16)).astype(np.float32)
    style = rng.normal(size=(b, 12)).astype(np.float32)
    ref_mel = rng.normal(size=(b, 8, prompt_len)).astype(np.float32)

    with torch.no_grad():
        t_span = torch.linspace(0, 1, steps + 1)
        ref_out = ref.models["cfm"].solve_euler(
            torch.from_numpy(noise.copy()), torch.tensor([t]),
            torch.from_numpy(ref_mel), torch.from_numpy(mu),
            torch.from_numpy(style), None, t_span,
            inference_cfg_rate=0.7).numpy()

    prompt_full = np.zeros((b, 8, t), dtype=np.float32)
    prompt_full[:, :, :prompt_len] = ref_mel

    def dit_apply(p, *a):
        return model.apply(p, *a, method=S2Mel.velocity)

    ours = np.asarray(cfm_inference(
        dit_apply, params, jnp.asarray(mu), jnp.asarray([t]),
        jnp.asarray(prompt_full), jnp.asarray([prompt_len]),
        jnp.asarray(style), None, steps, 0.7, noise=jnp.asarray(noise)))
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out, atol=2e-4, rtol=1e-3)


def test_cfm_step_tables_match_inline(ref_model):
    """Hoisted timestep tables == per-step inline projections (same params,
    same math, batched once) — exact to f32 noise."""
    _, params = ref_model
    model = S2Mel(CFG)
    rng = np.random.default_rng(4)
    b, t, prompt_len, steps = 1, 17, 6, 4
    noise = rng.normal(size=(b, 8, t)).astype(np.float32)
    mu = rng.normal(size=(b, t, 16)).astype(np.float32)
    style = rng.normal(size=(b, 12)).astype(np.float32)
    prompt_full = rng.normal(size=(b, 8, t)).astype(np.float32)

    def dit_apply(p, *a):
        return model.apply(p, *a, method=S2Mel.velocity)

    args = (dit_apply, params, jnp.asarray(mu), jnp.asarray([t]),
            jnp.asarray(prompt_full), jnp.asarray([prompt_len]),
            jnp.asarray(style), None, steps, 0.7)
    plain = np.asarray(cfm_inference(*args, noise=jnp.asarray(noise)))

    t_mids = jnp.linspace(0.0, 1.0, steps + 1)[:steps]
    tables = model.apply(params, t_mids, method=S2Mel.step_tables)
    hoisted = np.asarray(cfm_inference(*args, noise=jnp.asarray(noise),
                                       tables=tables))
    np.testing.assert_allclose(hoisted, plain, atol=1e-6, rtol=1e-6)
