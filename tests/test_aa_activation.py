"""Fused anti-alias snake activation: polyphase math vs torch oracle + Pallas.

The torch oracle implements the published alias-free activation semantics
(`alias_free_activation/torch/{filter,resample,act}.py`): replicate-pad ->
conv_transpose1d(stride 2, kaiser sinc) -> slice -> snake -> replicate-pad ->
conv1d(stride 2).
"""

import numpy as np
import pytest

from voice_tts_tpu.ops.aa_activation import (
    _aa_snake_jnp, aa_snake_activation, kaiser_sinc_filter,
)


def _torch_oracle(x_np, alpha_np, beta_recip_np):
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(x_np)
    c = x.shape[1]
    filt = torch.from_numpy(kaiser_sinc_filter(0.25, 0.3, 12)).view(1, 1, 12)

    # UpSample1d(ratio=2, kernel=12): pad=5, pad_left=pad_right=15
    xp = F.pad(x, (5, 5), mode="replicate")
    up = 2 * F.conv_transpose1d(xp, filt.expand(c, -1, -1), stride=2, groups=c)
    up = up[..., 15:-15]

    # snake
    a = torch.from_numpy(alpha_np).view(1, -1, 1)
    br = torch.from_numpy(beta_recip_np).view(1, -1, 1)
    z = up + br * torch.sin(up * a) ** 2

    # DownSample1d(ratio=2, kernel=12): LowPassFilter pad_left=5, pad_right=6
    zp = F.pad(z, (5, 6), mode="replicate")
    out = F.conv1d(zp, filt.expand(c, -1, -1), stride=2, groups=c)
    return out.numpy()


@pytest.fixture
def sample():
    rng = np.random.default_rng(0)
    b, c, t = 2, 12, 200
    x = rng.normal(size=(b, c, t)).astype(np.float32)
    alpha = np.exp(rng.normal(scale=0.3, size=c)).astype(np.float32)
    beta_recip = (1.0 / (np.exp(rng.normal(scale=0.3, size=c)) + 1e-9)).astype(np.float32)
    return x, alpha, beta_recip


def test_jnp_path_matches_torch_oracle(sample):
    x, alpha, beta_recip = sample
    ref = _torch_oracle(x, alpha, beta_recip)
    ours = np.asarray(_aa_snake_jnp(x, alpha, beta_recip))
    assert ours.shape == ref.shape == x.shape
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


def test_pallas_interpret_matches_jnp(sample):
    x, alpha, beta_recip = sample
    ref = np.asarray(_aa_snake_jnp(x, alpha, beta_recip))
    ours = np.asarray(aa_snake_activation(x, alpha, beta_recip, use_pallas=True,
                                          interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)


def test_channel_padding_path(sample):
    """C not a multiple of the 8-sublane tile must still work."""
    x, alpha, beta_recip = sample
    x5, a5, b5 = x[:, :5], alpha[:5], beta_recip[:5]
    ref = np.asarray(_aa_snake_jnp(x5, a5, b5))
    ours = np.asarray(aa_snake_activation(x5, a5, b5, use_pallas=True, interpret=True))
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)


def test_chunked_long_signal_matches_jnp():
    """T beyond one time tile exercises the overlapped-chunk plan."""
    from voice_tts_tpu.ops import aa_activation as m

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 8, 300)).astype(np.float32)
    alpha = np.ones(8, np.float32)
    beta_recip = np.ones(8, np.float32)

    ref = np.asarray(_aa_snake_jnp(x, alpha, beta_recip))
    orig = m._T_TILE
    try:
        m._T_TILE = 64  # force ~5 chunks
        ours = np.asarray(m._aa_snake_pallas(x, alpha, beta_recip, interpret=True))
    finally:
        m._T_TILE = orig
    # interior EXACT; the first/last 3 samples see snake(x_edge) instead of
    # the z-phase replicate (documented in _aa_kernel_chunked) — filter-tail
    # sized deviation only
    np.testing.assert_allclose(ours[..., 3:-3], ref[..., 3:-3],
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(ours[..., :3], ref[..., :3], atol=2e-2)
    np.testing.assert_allclose(ours[..., -3:], ref[..., -3:], atol=2e-2)
