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


def quantize_gpt_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """int8-quantize the GPT trunk projections in a (converted) param tree.

    Quantized modules get weight -> int8 plus a sibling `scale` param that
    `Conv1DGPT` detects at apply time; every other fp32 leaf becomes bf16.
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
                q, scale = quantize_int8(np.asarray(val["weight"]), axis=0)
                sub = {k2: walk(v2, f"{path}/{k2}") for k2, v2 in val.items()
                       if k2 != "weight"}
                sub["weight"] = jnp.asarray(q)
                sub["scale"] = jnp.asarray(scale)
                out[key] = sub
            else:
                out[key] = walk(val, path)
        return out

    return walk(params, "")
