"""int8 weight-only decode: Pallas fused-dequant GEMV + Conv1DGPT wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voice_tts_tpu.ops.int8_matmul import int8_gemv
from voice_tts_tpu.utils.quantize import quantize_int8, quantize_gpt_params


def _ref_gemv(x, w_q, scale):
    # the XLA dequant path the kernel must match: int8 -> x.dtype is exact
    return (jnp.dot(x, w_q.astype(x.dtype)) * scale.astype(x.dtype)).astype(x.dtype)


@pytest.mark.parametrize("n,d,f", [(1, 256, 512), (8, 256, 384), (4, 128, 128)])
def test_int8_gemv_matches_xla_dequant(n, d, f):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)
    w = rng.normal(size=(d, f)).astype(np.float32)
    w_q, scale = quantize_int8(w, axis=0)
    w_q, scale = jnp.asarray(w_q), jnp.asarray(scale)

    got = int8_gemv(x, w_q, scale, interpret=True)
    want = _ref_gemv(x, w_q, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_int8_gemv_bf16_inputs():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 128)), dtype=jnp.bfloat16)
    w_q, scale = quantize_int8(rng.normal(size=(128, 256)).astype(np.float32),
                               axis=0)
    got = int8_gemv(x, jnp.asarray(w_q), jnp.asarray(scale), interpret=True)
    want = _ref_gemv(x, jnp.asarray(w_q), jnp.asarray(scale))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_conv1d_gpt_int8_branch():
    """Quantized Conv1DGPT (decode-sized input -> Pallas branch) stays close
    to the fp32 module; exact vs the XLA dequant reference."""
    from voice_tts_tpu.models.gpt.gpt2 import Conv1DGPT

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 1, 128)), dtype=jnp.float32)
    mod = Conv1DGPT(256)
    params = mod.init(jax.random.PRNGKey(0), x)
    y_fp32 = mod.apply(params, x)

    q = quantize_gpt_params({"attn_c_attn": params["params"]})["attn_c_attn"]
    y_int8 = mod.apply({"params": q}, x.astype(jnp.bfloat16))

    w_q, scale, b = q["weight"], q["scale"], q["bias"]
    want = _ref_gemv(x.astype(jnp.bfloat16).reshape(2, 128), w_q, scale)
    want = want.reshape(2, 1, 256) + b
    np.testing.assert_allclose(np.asarray(y_int8, np.float32),
                               np.asarray(want, np.float32), rtol=2e-2,
                               atol=2e-2)
    # quantization error vs fp32 stays small-ish (sanity, not parity)
    err = np.max(np.abs(np.asarray(y_int8, np.float32) - np.asarray(y_fp32)))
    assert err < 0.5
