"""Whole-sequence VMEM attention kernel vs the DiT einsum path."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from voice_tts_tpu.ops.attic.cfm_attention import cfm_attention


def _einsum_ref(q, k, v, lens, scale):
    """Mirror of the DiTBlock einsum branch (f32 softmax, key mask)."""
    b, h, t, hd = q.shape
    scores = jnp.einsum("bhid,bhjd->bhij", q, k).astype(jnp.float32) * scale
    mask = jnp.arange(t)[None, :] < lens[:, None]          # (B, T) keys
    scores = jnp.where(mask[:, None, None, :], scores,
                       jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("bhij,bhjd->bhid", probs, v)


@pytest.mark.parametrize("t,lens", [(160, (160, 96)), (128, (50, 128))])
def test_matches_einsum_valid_region(t, lens):
    b, h, hd = 2, 4, 64
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, t, hd), jnp.float32)
               for kk in keys)
    lens = jnp.asarray(lens, jnp.int32)
    scale = hd ** -0.5

    ref = np.asarray(_einsum_ref(q, k, v, lens, scale))
    out = np.asarray(cfm_attention(q, k, v, lens, scale, interpret=True))
    assert out.shape == ref.shape
    # only query rows < lens are consumed downstream (length-masked)
    for i in range(b):
        n = int(lens[i])
        np.testing.assert_allclose(out[i, :, :n], ref[i, :, :n],
                                   atol=2e-5, rtol=2e-5)
    assert np.isfinite(out).all()  # fully-masked rows must not NaN


def test_unpadded_t_multiple_of_128():
    b, h, t, hd = 1, 2, 256, 64
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q, k, v = (jax.random.normal(kk, (b, h, t, hd), jnp.float32)
               for kk in keys)
    lens = jnp.asarray([256], jnp.int32)
    ref = np.asarray(_einsum_ref(q, k, v, lens, hd ** -0.5))
    out = np.asarray(cfm_attention(q, k, v, lens, hd ** -0.5, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_bf16_values():
    b, h, t, hd = 2, 2, 160, 64
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = (jax.random.normal(kk, (b, h, t, hd), jnp.bfloat16)
               for kk in keys)
    lens = jnp.asarray([160, 100], jnp.int32)
    ref = np.asarray(_einsum_ref(q, k, v, lens, hd ** -0.5)
                     .astype(jnp.float32))
    out = np.asarray(cfm_attention(q, k, v, lens, hd ** -0.5, interpret=True)
                     .astype(jnp.float32))
    for i in range(b):
        n = int(lens[i])
        np.testing.assert_allclose(out[i, :, :n], ref[i, :, :n],
                                   atol=3e-2, rtol=3e-2)
