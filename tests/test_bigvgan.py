"""BigVGAN: layer parity vs torch, and full-model parity via converted
reference checkpoints (random weights, tiny dims)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from voice_tts_tpu.config import BigVGANConfig
from voice_tts_tpu.models.layers import Conv1d, ConvTranspose1d
from voice_tts_tpu.models.vocoder import BigVGAN
from voice_tts_tpu.utils.checkpoint import convert_bigvgan, fold_weight_norm

from tests.reference_oracle import install_reference, reference_available


def test_conv1d_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 31)).astype(np.float32)
    tconv = torch.nn.Conv1d(6, 10, 5, stride=2, padding=3, dilation=2)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    layer = Conv1d(10, 5, stride=2, padding=3, dilation=2)
    params = {"params": {"weight": tconv.weight.detach().numpy(),
                         "bias": tconv.bias.detach().numpy()}}
    ours = np.asarray(layer.apply(params, x))
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_conv_transpose1d_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 13)).astype(np.float32)
    tconv = torch.nn.ConvTranspose1d(6, 4, 8, stride=4, padding=2)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    layer = ConvTranspose1d(4, 8, stride=4, padding=2)
    params = {"params": {"weight": tconv.weight.detach().numpy(),
                         "bias": tconv.bias.detach().numpy()}}
    ours = np.asarray(layer.apply(params, x))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_fold_weight_norm():
    import torch

    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 3))
    sd = {k: v.detach().numpy() for k, v in conv.state_dict().items()}
    folded = fold_weight_norm(sd)
    torch.nn.utils.remove_weight_norm(conv)
    np.testing.assert_allclose(folded["weight"], conv.weight.detach().numpy(),
                               atol=1e-6, rtol=1e-6)


TINY = BigVGANConfig(
    num_mels=20, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
    upsample_initial_channel=32, resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_bigvgan_parity_with_reference_checkpoint():
    install_reference()
    import torch
    from indextts.s2mel.modules.bigvgan.bigvgan import AttrDict
    from indextts.s2mel.modules.bigvgan.bigvgan import BigVGAN as RefBigVGAN

    h = AttrDict({
        "resblock": "1", "upsample_rates": list(TINY.upsample_rates),
        "upsample_kernel_sizes": list(TINY.upsample_kernel_sizes),
        "upsample_initial_channel": TINY.upsample_initial_channel,
        "resblock_kernel_sizes": list(TINY.resblock_kernel_sizes),
        "resblock_dilation_sizes": [list(d) for d in TINY.resblock_dilation_sizes],
        "activation": TINY.activation, "snake_logscale": TINY.snake_logscale,
        "use_bias_at_final": TINY.use_bias_at_final,
        "use_tanh_at_final": TINY.use_tanh_at_final, "num_mels": TINY.num_mels,
    })
    torch.manual_seed(0)
    ref_model = RefBigVGAN(h)
    # randomize snake params away from init so parity is meaningful
    with torch.no_grad():
        for name, p in ref_model.named_parameters():
            if name.endswith("alpha") or name.endswith("beta"):
                p.copy_(torch.randn_like(p) * 0.3)
    ref_model.eval()

    rng = np.random.default_rng(2)
    mel = rng.normal(size=(1, TINY.num_mels, 17)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(torch.from_numpy(mel)).numpy()

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params = convert_bigvgan(sd)
    model = BigVGAN(TINY, use_pallas=False)
    ours = np.asarray(model.apply(params, mel))

    assert ours.shape == ref_out.shape == (1, 1, 17 * 16)
    np.testing.assert_allclose(ours, ref_out, atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_bigvgan_pallas_interpret_parity():
    """Pallas-kernel model output == jnp-path model output on the same params."""
    rng = np.random.default_rng(3)
    mel = rng.normal(size=(1, TINY.num_mels, 9)).astype(np.float32)
    model_jnp = BigVGAN(TINY, use_pallas=False)
    params = model_jnp.init(jax.random.PRNGKey(0), mel)
    ref = np.asarray(model_jnp.apply(params, mel))

    import voice_tts_tpu.ops.aa_activation as aa
    orig = aa.aa_snake_activation

    def forced(*a, **k):
        k.pop("use_pallas", None)
        k.pop("interpret", None)
        return orig(*a[:3], use_pallas=True, interpret=True)

    aa.aa_snake_activation = forced
    try:
        import voice_tts_tpu.models.vocoder.bigvgan as bv
        bv.aa_snake_activation = forced
        ours = np.asarray(BigVGAN(TINY, use_pallas=True).apply(params, mel))
    finally:
        aa.aa_snake_activation = orig
        bv.aa_snake_activation = orig
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_bigvgan_packed_parity():
    """Packed grouped-conv path == module path, multi-kernel-size stages."""
    from voice_tts_tpu.models.vocoder.packed import (
        bigvgan_packed_apply, can_pack, pack_bigvgan)

    cfg = BigVGANConfig(
        num_mels=12, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=24, resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
    )
    assert can_pack(cfg)
    model = BigVGAN(cfg, use_pallas=False)
    rng = np.random.default_rng(7)
    mel = rng.normal(size=(2, cfg.num_mels, 11)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(5), mel)
    # move snake params off their init values
    params = jax.tree.map(lambda x: x + 0.1, params)
    ref = np.asarray(model.apply(params, mel))

    packed = pack_bigvgan(params, cfg)
    ours = np.asarray(bigvgan_packed_apply(packed, mel, cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_bigvgan_shared_act_parity():
    """Shared-activation path (one AA call per iter across the nk resblocks,
    dense per-block convs) == module path."""
    from voice_tts_tpu.models.vocoder.packed import (
        bigvgan_shared_act_apply, pack_bigvgan_shared)

    cfg = BigVGANConfig(
        num_mels=12, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=24, resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
    )
    model = BigVGAN(cfg, use_pallas=False)
    rng = np.random.default_rng(11)
    mel = rng.normal(size=(2, cfg.num_mels, 11)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(6), mel)
    params = jax.tree.map(lambda x: x + 0.1, params)
    ref = np.asarray(model.apply(params, mel))

    packed = pack_bigvgan_shared(params, cfg)
    ours = np.asarray(bigvgan_shared_act_apply(packed, mel, cfg))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


def test_bigvgan_packed_rejects_mismatched_schedules():
    from voice_tts_tpu.models.vocoder.packed import can_pack

    cfg = BigVGANConfig(resblock_kernel_sizes=(3, 8),
                        resblock_dilation_sizes=((1, 3), (1, 3)))
    assert not can_pack(cfg)
    cfg = BigVGANConfig(resblock_kernel_sizes=(3, 7),
                        resblock_dilation_sizes=((1, 3), (1, 5)))
    assert not can_pack(cfg)
