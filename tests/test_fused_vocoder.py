"""Fused resblock-stage kernel: interior exactness + full-model assembly."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from voice_tts_tpu.config import BigVGANConfig
from voice_tts_tpu.models.vocoder import BigVGAN
from voice_tts_tpu.models.vocoder.bigvgan import AMPBlock1
from voice_tts_tpu.ops.attic.fused_vocoder import (
    bigvgan_fused_apply, fused_resblock_stage, fused_stage_plan,
    pack_fused_stages, pack_stage,
)

CFG = BigVGANConfig(
    num_mels=12, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
    upsample_initial_channel=32, resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5),) * 3,
)
HALO = 78  # stage stencil halo (see ops/fused_vocoder.py)


def _module_stage(params, stage, x, cfg):
    nk = len(cfg.resblock_kernel_sizes)
    ch = x.shape[1]
    xs = None
    for j in range(nk):
        blk = AMPBlock1(ch, cfg.resblock_kernel_sizes[j],
                        tuple(cfg.resblock_dilation_sizes[j]),
                        cfg.snake_logscale, cfg.activation == "snakebeta",
                        use_pallas=False)
        out = blk.apply({"params": params["params"][f"resblocks_{stage * nk + j}"]}, x)
        xs = out if xs is None else xs + out
    return xs / nk


def _init_model(cfg):
    model = BigVGAN(cfg, use_pallas=False)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.num_mels, 8)))
    # move snake params off zero so the activation actually bends
    return model, jax.tree.map(lambda v: v + 0.05, params)


def test_fused_stage_interior_exact():
    model, params = _init_model(CFG)
    c, t, stage = 16, 512, 0  # stage 0 output channels = 32 // 2 = 16
    x = (jax.random.normal(jax.random.PRNGKey(3), (1, c, t)) * 0.3).astype(
        jnp.float32)

    ref = np.asarray(_module_stage(params, stage, x, CFG))
    pack = pack_stage(params, stage, CFG)
    out = np.asarray(fused_resblock_stage(
        x, pack, (1, 3, 5), 11, tt=128, interpret=True))

    assert out.shape == ref.shape
    scale = float(np.abs(ref).max())
    # interior: exact to f32 noise (beyond the signal-edge halo)
    np.testing.assert_allclose(out[..., HALO:-HALO], ref[..., HALO:-HALO],
                               atol=1e-5 * scale, rtol=1e-4)
    # edges: bounded deviation (zero- vs replicate-padding of activations)
    assert np.max(np.abs(out - ref)) < 0.01 * scale


@pytest.mark.ci_tier
def test_fused_stage_multi_chunk_matches_single_chunk():
    model, params = _init_model(CFG)
    x = (jax.random.normal(jax.random.PRNGKey(4), (1, 16, 512)) * 0.3).astype(
        jnp.float32)
    pack = pack_stage(params, 0, CFG)
    one = np.asarray(fused_resblock_stage(x, pack, (1, 3, 5), 11, tt=512,
                                          interpret=True))
    many = np.asarray(fused_resblock_stage(x, pack, (1, 3, 5), 11, tt=128,
                                           interpret=True))
    np.testing.assert_allclose(many, one, atol=1e-6, rtol=1e-6)


def test_fused_full_model_parity():
    model, params = _init_model(CFG)
    mel = (jax.random.normal(jax.random.PRNGKey(5), (1, CFG.num_mels, 24))
           * 0.3).astype(jnp.float32)
    ref = np.asarray(model.apply(params, mel))

    import voice_tts_tpu.ops.attic.fused_vocoder as fv
    assert fused_stage_plan(CFG) == [True, True]
    packs = pack_fused_stages(params, CFG)
    orig = fv._tt_for_channels
    fv._tt_for_channels = lambda c: 128
    try:
        out = np.asarray(bigvgan_fused_apply(params, packs, mel, CFG,
                                             interpret=True))
    finally:
        fv._tt_for_channels = orig

    assert out.shape == ref.shape
    # final output is clipped to [-1, 1]; match away from the edge halos
    np.testing.assert_allclose(out[..., 4 * HALO:-4 * HALO],
                               ref[..., 4 * HALO:-4 * HALO],
                               atol=1e-4, rtol=1e-3)
    assert np.max(np.abs(out - ref)) <= 2.0  # clip bounds the edge region


def test_engine_flag_gated_off_on_cpu():
    """`use_fused_vocoder` is TPU-only: on the CPU test backend the engine
    must silently keep the module vocoder (flag wiring in engine.__init__)."""
    from voice_tts_tpu.engine import TTSEngine

    eng = TTSEngine.tiny(seed=0, use_fused_vocoder=True)
    assert eng._fused_voc is False
    assert eng._packed_voc is False
    # param tree untouched (no pack wrapper dict)
    assert "params" in eng.params_voc_rt
