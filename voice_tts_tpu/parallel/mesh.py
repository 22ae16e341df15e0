"""Device mesh + parameter sharding for multi-chip serving and training.

The reference's only parallelism is process-level data parallel (gunicorn
fork + one GPU per worker, `gunicorn_config.py:43-60`).  The TPU-native
equivalents:

- **serving DP**: full replica per chip — `make_mesh(("dp",))`, parameters
  replicated, requests routed per chip (no collectives, pure ICI-free DP);
- **TP**: when a model exceeds one chip, attention/MLP matmuls shard over the
  "tp" axis with XLA inserting all-reduces over ICI (replaces the dormant HF
  `parallelize()` layer-split at reference `model_v2.py:61-77`);
- **training DP+TP**: batch over "dp", parameters over "tp"
  (`voice_tts_tpu.parallel.training`).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Sequence[str] = ("dp", "tp"),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        if len(axes) == 1:
            shape = (n,)
        else:
            # favour tp within a slice but keep dp > 1 when possible so both
            # axes are exercised (tp <= 4 covers the flagship model widths)
            tp = 1
            for cand in (4, 2, 1):
                if n % cand == 0 and n // cand >= 1:
                    tp = cand
                    break
            shape = (n // tp, tp)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axes))


# (regex over 'path/like/this', PartitionSpec) — first match wins.
# Specs reference the "tp" axis; replicated otherwise.
_GPT_RULES: Tuple[Tuple[str, P], ...] = (
    # GPT-2 trunk: megatron-style column/row parallel pairs
    (r".*attn_c_attn/weight$", P(None, "tp")),
    (r".*attn_c_attn/bias$", P("tp")),
    (r".*attn_c_proj/weight$", P("tp", None)),
    (r".*mlp_c_fc/weight$", P(None, "tp")),
    (r".*mlp_c_fc/bias$", P("tp")),
    (r".*mlp_c_proj/weight$", P("tp", None)),
    # vocab-sharded heads / embeddings (torch Linear layout (out, in))
    (r".*mel_head/weight$", P("tp", None)),
    (r".*text_head/weight$", P("tp", None)),
    (r".*mel_head/bias$", P("tp")),
    (r".*text_head/bias$", P("tp")),
    (r".*(mel|text)_embedding/weight$", P("tp", None)),
    # conformer / perceiver FF
    (r".*ff_w1/weight$", P("tp", None)),
    (r".*ff_w2/weight$", P(None, "tp")),
    (r".*proj_in/weight$", P("tp", None)),
    (r".*proj_out/weight$", P(None, "tp")),
    # DiT SwiGLU
    (r".*/w1/weight$", P("tp", None)),
    (r".*/w3/weight$", P("tp", None)),
    (r".*/w2/weight$", P(None, "tp")),
)


def param_sharding_rules():
    return _GPT_RULES


def _spec_for(path: str, mesh: Mesh) -> P:
    if "tp" not in mesh.axis_names or mesh.shape.get("tp", 1) == 1:
        return P()
    for pattern, spec in _GPT_RULES:
        if re.match(pattern, path):
            return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        parts.append(getattr(k, "key", getattr(k, "idx", None)) or str(k))
    return "/".join(str(p) for p in parts)


def sharding_tree(params, mesh: Mesh):
    """NamedSharding tree for a parameter pytree (tp where divisible)."""

    def leaf(path, x):
        spec = _spec_for(_path_str(path), mesh)
        # verify divisibility; fall back to replication
        tp = mesh.shape.get("tp", 1)
        for dim, axis in enumerate(spec):
            if axis == "tp" and x.shape[dim] % tp != 0:
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(leaf, params)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh with TP sharding rules."""
    shardings = sharding_tree(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)
