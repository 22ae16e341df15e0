"""Weight-only int8 quantization for the bandwidth-bound GPT decode path.

AR decode reads every GPT matmul weight once per generated token; on TPU the
step time is dominated by those HBM reads.  Storing the big projection
matrices as int8 with per-output-channel scales halves the bytes read (XLA
fuses the dequantizing convert into the dot operand).  Opt-in via
`EngineConfig.use_int8_decode`; teacher-forced latent and everything
parity-sensitive keep their bf16/fp32 paths.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# modules worth quantizing: the GPT-2 trunk projections
_QUANT_MODULES = ("attn_c_attn", "attn_c_proj", "mlp_c_fc", "mlp_c_proj")


def quantize_int8(w: np.ndarray, axis: int) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel int8: returns (q (int8), scale (f32))."""
    w = np.asarray(w, dtype=np.float32)
    amax = np.max(np.abs(w), axis=axis, keepdims=True)
    scale = np.maximum(amax, 1e-8) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


@jax.jit
def _quantize_int8_device(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Device-side symmetric per-output-channel int8 (axis=0 reduction).

    Runs on the accelerator: pulling the GPT weights to the host just to
    round them would move ~2 GB over the (slow) host link.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_gpt_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """int8-quantize the GPT trunk projections in a (converted) param tree.

    Quantized modules get weight -> int8 plus a sibling `scale` param that
    `Conv1DGPT` detects at apply time; every other fp32 leaf becomes bf16.
    All arithmetic stays on device.
    """

    def walk(node, prefix):
        if not isinstance(node, dict):
            if hasattr(node, "dtype") and node.dtype == jnp.float32:
                return node.astype(jnp.bfloat16)
            return node
        out = {}
        for key, val in node.items():
            path = f"{prefix}/{key}" if prefix else key
            if (isinstance(val, dict) and "weight" in val
                    and key in _QUANT_MODULES
                    and np.ndim(val["weight"]) == 2):
                q, scale = _quantize_int8_device(jnp.asarray(val["weight"]))
                sub = {k2: walk(v2, f"{path}/{k2}") for k2, v2 in val.items()
                       if k2 != "weight"}
                sub["weight"] = q
                sub["scale"] = scale
                out[key] = sub
            else:
                out[key] = walk(val, path)
        return out

    return walk(params, "")
