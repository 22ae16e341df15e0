"""Model artifact store: save/load converted parameters + config + extras.

Replaces the reference's four ad-hoc loaders and its HF-hub downloads
(`SURVEY.md` §5 checkpoint) with one on-disk layout:

    <dir>/config.json                  TTSConfig
    <dir>/<family>.msgpack             flax-serialized param pytrees
    <dir>/extras.msgpack               w2v stats, emo/spk matrices
    <dir>/bpe.model                    sentencepiece model (optional)

`convert_reference_artifacts` maps the original torch/safetensors checkpoint
files into this layout using the per-family converters in
`voice_tts_tpu.utils.checkpoint`.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

FAMILIES = ("gpt", "s2mel", "vocoder", "campplus", "repcodec", "w2v")


def save_pytree(path: str, tree) -> None:
    from flax import serialization
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))


def load_pytree(path: str):
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_artifacts(directory: str, cfg, params: Dict[str, dict],
                   extras: Optional[Dict[str, np.ndarray]] = None,
                   bpe_model_bytes: Optional[bytes] = None) -> None:
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "config.json"), "w") as f:
        f.write(cfg.to_json(indent=2))
    for family in FAMILIES:
        if family in params:
            save_pytree(os.path.join(directory, f"{family}.msgpack"),
                        params[family])
    if extras:
        packed = {}
        for k, v in extras.items():
            if isinstance(v, (list, tuple)):
                packed[k] = {str(i): np.asarray(x) for i, x in enumerate(v)}
            else:
                packed[k] = np.asarray(v)
        save_pytree(os.path.join(directory, "extras.msgpack"), packed)
    if bpe_model_bytes:
        with open(os.path.join(directory, "bpe.model"), "wb") as f:
            f.write(bpe_model_bytes)


def load_artifacts(directory: str):
    from voice_tts_tpu.config import TTSConfig

    with open(os.path.join(directory, "config.json")) as f:
        cfg = TTSConfig.from_json(f.read())
    params = {}
    for family in FAMILIES:
        path = os.path.join(directory, f"{family}.msgpack")
        if os.path.exists(path):
            params[family] = load_pytree(path)
    extras = {}
    epath = os.path.join(directory, "extras.msgpack")
    if os.path.exists(epath):
        raw = load_pytree(epath)
        for k, v in raw.items():
            if isinstance(v, dict):
                extras[k] = [v[str(i)] for i in range(len(v))]
            else:
                extras[k] = v
    bpe = None
    bpath = os.path.join(directory, "bpe.model")
    if os.path.exists(bpath):
        with open(bpath, "rb") as f:
            bpe = f.read()
    return cfg, params, extras, bpe


def convert_reference_artifacts(cfg, gpt_checkpoint: Optional[str] = None,
                                s2mel_checkpoint: Optional[str] = None,
                                vocoder_checkpoint: Optional[str] = None,
                                campplus_checkpoint: Optional[str] = None,
                                semantic_codec_checkpoint: Optional[str] = None,
                                w2v_bert_dir: Optional[str] = None,
                                w2v_stat: Optional[str] = None,
                                emo_matrix: Optional[str] = None,
                                spk_matrix: Optional[str] = None,
                                ) -> tuple:
    """torch-era checkpoint files -> (params, extras) in our layout."""
    from voice_tts_tpu.utils import checkpoint as ckpt

    params: Dict[str, dict] = {}
    extras: Dict[str, np.ndarray] = {}
    if gpt_checkpoint:
        params["gpt"] = ckpt.convert_unified_voice(
            ckpt.load_state_dict(gpt_checkpoint))
    if s2mel_checkpoint:
        params["s2mel"] = ckpt.convert_s2mel(
            ckpt.load_state_dict(s2mel_checkpoint),
            cfg.s2mel.length_regulator.num_sampling_ratios)
    if vocoder_checkpoint:
        params["vocoder"] = ckpt.convert_bigvgan(
            ckpt.load_state_dict(vocoder_checkpoint))
    if campplus_checkpoint:
        params["campplus"] = ckpt.convert_campplus(
            ckpt.load_state_dict(campplus_checkpoint))
    if semantic_codec_checkpoint:
        params["repcodec"] = ckpt.convert_repcodec(
            ckpt.load_state_dict(semantic_codec_checkpoint))
    if w2v_bert_dir:
        sd_path = os.path.join(w2v_bert_dir, "model.safetensors")
        params["w2v"] = ckpt.convert_w2v_bert(
            ckpt.load_state_dict(sd_path), cfg.w2v_bert.output_layer)
    if w2v_stat:
        stats = ckpt.load_state_dict(w2v_stat)
        extras["w2v_mean"] = np.asarray(stats["mean"])
        extras["w2v_std"] = np.sqrt(np.asarray(stats["var"]))
    if emo_matrix:
        mat = ckpt.load_state_dict(emo_matrix)
        extras["emo_matrix_raw"] = next(iter(mat.values())) if isinstance(mat, dict) else mat
    if spk_matrix:
        mat = ckpt.load_state_dict(spk_matrix)
        extras["spk_matrix_raw"] = next(iter(mat.values())) if isinstance(mat, dict) else mat
    return params, extras


def split_matrix_groups(matrix: np.ndarray, emo_num) -> list:
    """Split a stacked emo/spk matrix into per-emotion groups
    (reference `infer_v2.py:168-176` torch.split semantics)."""
    out = []
    offset = 0
    for n in emo_num:
        out.append(np.asarray(matrix[offset:offset + n]))
        offset += n
    return out
