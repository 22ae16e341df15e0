"""Checkpoint conversion: torch/safetensors state dicts -> JAX pytrees.

Unifies the reference's four loader styles (strict `utils/checkpoint.py:25-34`,
shape-filtered `commons.py:568-624`, safetensors `infer_v2.py:124`, HF hub
`bigvgan.py:413-492`) into one converter per model family.  All converters:

- fold weight norm (`weight_g`/`weight_v` or parametrizations) into plain
  weights — the reference removes weight norm before inference anyway;
- keep torch tensor layouts (our layers store torch-layout weights), so the
  mapping is a pure rename;
- drop buffers that are recomputed (anti-alias `filter`, positional tables).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Mapping

import numpy as np


# ---------------------------------------------------------------------------
# loading + generic transforms
# ---------------------------------------------------------------------------

def load_state_dict(path: str, load_ema: bool = False) -> Dict[str, np.ndarray]:
    """Load a .pt/.pth/.bin (torch pickle) or .safetensors file into numpy.

    Handles every wrapper shape the reference loaders accept: flat state
    dicts, single-key wrappers (generator/model/state_dict/net), and the
    s2mel trainer's MODULE-KEYED nesting `state["net"][module][param]`
    (`commons.py:568-589`), which flattens to the `models.<module>.<param>`
    names the renamer rules expect.  `load_ema=True` substitutes the EMA
    shadow weights the same way `load_checkpoint2(load_ema=True)` does
    (`commons.py:579-587`): `state["ema"][module][0]` is a POSITIONAL tensor
    list aligned with the module's param order, skipping `input_pos`.
    """
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        return dict(load_file(path))
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    ema = None
    if isinstance(obj, dict):
        if load_ema and isinstance(obj.get("ema"), dict):
            ema = obj["ema"]
        for key in ("generator", "model", "state_dict", "net"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    if (isinstance(obj, dict) and obj
            and all(isinstance(v, dict) for v in obj.values())):
        # module-keyed nesting (the real s2mel checkpoint format)
        if ema is not None:
            obj = {mk: dict(sub) for mk, sub in obj.items()}
            for mk, sub in obj.items():
                if mk not in ema:
                    continue
                shadow = ema[mk][0]
                i = 0
                for pk in sub:
                    if "input_pos" in pk:
                        continue
                    assert sub[pk].shape == shadow[i].shape, (mk, pk)
                    sub[pk] = shadow[i]
                    i += 1
        obj = {f"models.{mk}.{pk}": pv
               for mk, sub in obj.items() for pk, pv in sub.items()}
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()}


def strip_ddp_prefix(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Remove 'module.' prefixes left by DDP training (reference
    `commons.py:591-596`)."""
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def fold_weight_norm(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Replace (weight_g, weight_v) pairs with weight = g * v / ||v||.

    Handles both classic `foo.weight_g` and parametrized
    `foo.parametrizations.weight.original0/1` naming.  Norm is over all dims
    except dim 0 (torch weight_norm default dim=0).
    """
    out: Dict[str, np.ndarray] = {}
    done = set()
    for key in sd:
        if key in done:
            continue
        m = re.match(r"^((?:.*\.)?)weight_g$", key)
        p = re.match(r"^((?:.*\.)?)parametrizations\.weight\.original0$", key)
        if m:
            base = m.group(1)  # '' or 'prefix.'
            g, v = np.asarray(sd[key]), np.asarray(sd[base + "weight_v"])
            done.update({key, base + "weight_v"})
        elif p:
            base = p.group(1)
            g = np.asarray(sd[key])
            v = np.asarray(sd[base + "parametrizations.weight.original1"])
            done.update({key, base + "parametrizations.weight.original1"})
        else:
            continue
        axes = tuple(range(1, v.ndim))
        norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=axes, keepdims=True))
        out[base + "weight"] = (g.reshape(norm.shape) * v / norm).astype(v.dtype)
    for key, val in sd.items():
        if key not in done:
            out[key] = np.asarray(val)
    return out


class Renamer:
    """Collects regex rename rules mapping torch keys to flax param paths."""

    def __init__(self):
        self.rules: list[tuple[re.Pattern, Any]] = []

    def rule(self, pattern: str, repl) -> "Renamer":
        self.rules.append((re.compile(pattern), repl))
        return self

    def __call__(self, key: str):
        for pat, repl in self.rules:
            m = pat.match(key)
            if m:
                if repl is None:
                    return None  # drop
                target = m.expand(repl) if isinstance(repl, str) else repl(m)
                return target
        raise KeyError(f"no rename rule for checkpoint key {key!r}")


def to_tree(flat: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    """'a/b/c' -> nested dicts."""
    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = val
    return tree


def convert(sd: Mapping[str, np.ndarray], renamer: Renamer,
            transforms: Mapping[str, Callable[[np.ndarray], np.ndarray]] | None = None,
            ) -> Dict[str, Any]:
    """Apply weight-norm folding, renaming, and optional per-key transforms."""
    sd = fold_weight_norm(strip_ddp_prefix(sd))
    flat: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        target = renamer(key)
        if target is None:
            continue
        if transforms and target in transforms:
            val = transforms[target](val)
        flat[target] = np.asarray(val)
    return to_tree(flat)


# ---------------------------------------------------------------------------
# BigVGAN (reference `s2mel/modules/bigvgan/bigvgan.py`)
# ---------------------------------------------------------------------------

def bigvgan_renamer() -> Renamer:
    r = Renamer()
    r.rule(r"^conv_pre\.(weight|bias)$", r"conv_pre/\1")
    r.rule(r"^ups\.(\d+)\.0\.(weight|bias)$", r"ups_\1/\2")
    r.rule(r"^resblocks\.(\d+)\.convs1\.(\d+)\.(weight|bias)$", r"resblocks_\1/convs1_\2/\3")
    r.rule(r"^resblocks\.(\d+)\.convs2\.(\d+)\.(weight|bias)$", r"resblocks_\1/convs2_\2/\3")
    r.rule(r"^resblocks\.(\d+)\.activations\.(\d+)\.act\.(alpha|beta)$",
           r"resblocks_\1/act_\2/\3")
    r.rule(r"^activation_post\.act\.(alpha|beta)$", r"activation_post/\1")
    r.rule(r"^conv_post\.(weight|bias)$", r"conv_post/\1")
    # anti-alias filter buffers are constants rebuilt from the formula
    r.rule(r".*\.(upsample|downsample|lowpass)[\.\w]*filter$", None)
    return r


def convert_bigvgan(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    return {"params": convert(sd, bigvgan_renamer())}


# ---------------------------------------------------------------------------
# CAMPPlus (reference `s2mel/modules/campplus/DTDNN.py`)
# ---------------------------------------------------------------------------

def campplus_renamer() -> Renamer:
    bn = r"(weight|bias|running_mean|running_var)"
    r = Renamer()
    r.rule(r".*num_batches_tracked$", None)
    r.rule(r"^head\.conv(\d)\.weight$", r"head/conv\1/weight")
    r.rule(rf"^head\.bn(\d)\.{bn}$", r"head/bn\1/\2")
    r.rule(r"^head\.layer(\d)\.(\d)\.conv(\d)\.weight$", r"head/layer\1_\2/conv\3/weight")
    r.rule(rf"^head\.layer(\d)\.(\d)\.bn(\d)\.{bn}$", r"head/layer\1_\2/bn\3/\4")
    r.rule(r"^head\.layer(\d)\.(\d)\.shortcut\.0\.weight$", r"head/layer\1_\2/shortcut_conv/weight")
    r.rule(rf"^head\.layer(\d)\.(\d)\.shortcut\.1\.{bn}$", r"head/layer\1_\2/shortcut_bn/\3")
    r.rule(r"^xvector\.tdnn\.linear\.weight$", r"tdnn_linear/weight")
    r.rule(rf"^xvector\.tdnn\.nonlinear\.batchnorm\.{bn}$", r"tdnn_bn/\1")
    r.rule(rf"^xvector\.(block\d)\.(tdnnd\d+)\.nonlinear(\d)\.batchnorm\.{bn}$",
           r"\1_\2/nonlinear\3_bn/\4")
    r.rule(r"^xvector\.(block\d)\.(tdnnd\d+)\.linear1\.weight$", r"\1_\2/linear1/weight")
    r.rule(r"^xvector\.(block\d)\.(tdnnd\d+)\.cam_layer\.(linear_local|linear1|linear2)\.(weight|bias)$",
           r"\1_\2/cam_layer/\3/\4")
    r.rule(rf"^xvector\.transit(\d)\.nonlinear\.batchnorm\.{bn}$", r"transit\1_bn/\2")
    r.rule(r"^xvector\.transit(\d)\.linear\.weight$", r"transit\1_linear/weight")
    r.rule(rf"^xvector\.out_nonlinear\.batchnorm\.{bn}$", r"out_bn/\1")
    r.rule(r"^xvector\.dense\.linear\.weight$", r"dense_linear/weight")
    r.rule(rf"^xvector\.dense\.nonlinear\.batchnorm\.{bn}$", r"dense_bn/\1")
    return r


def convert_campplus(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    return {"params": convert(sd, campplus_renamer())}


# ---------------------------------------------------------------------------
# RepCodec semantic codec (reference `kmeans/repcodec_model.py`)
# ---------------------------------------------------------------------------

def repcodec_renamer() -> Renamer:
    r = Renamer()
    r.rule(r"^decoder\.0\.embed\.(weight|bias)$", r"decoder_backbone/embed/\1")
    r.rule(r"^decoder\.0\.norm\.(weight|bias)$", r"decoder_backbone/norm/\1")
    r.rule(r"^decoder\.0\.convnext\.(\d+)\.(dwconv|norm|pwconv1|pwconv2)\.(weight|bias)$",
           r"decoder_backbone/convnext_\1/\2/\3")
    r.rule(r"^decoder\.0\.convnext\.(\d+)\.gamma$", r"decoder_backbone/convnext_\1/gamma")
    r.rule(r"^decoder\.0\.final_layer_norm\.(weight|bias)$",
           r"decoder_backbone/final_layer_norm/\1")
    r.rule(r"^decoder\.1\.(weight|bias)$", r"decoder_out/\1")
    r.rule(r"^(down|up)\.(weight|bias)$", r"\1/\2")
    r.rule(r"^encoder\.0\.embed\.(weight|bias)$", r"encoder_backbone/embed/\1")
    r.rule(r"^encoder\.0\.norm\.(weight|bias)$", r"encoder_backbone/norm/\1")
    r.rule(r"^encoder\.0\.convnext\.(\d+)\.(dwconv)\.(weight|bias)$",
           r"encoder_backbone/convnext_\1/\2/\3")
    r.rule(r"^encoder\.0\.convnext\.(\d+)\.(norm|pwconv1|pwconv2)\.(weight|bias)$",
           r"encoder_backbone/convnext_\1/\2/\3")
    r.rule(r"^encoder\.0\.convnext\.(\d+)\.gamma$", r"encoder_backbone/convnext_\1/gamma")
    r.rule(r"^encoder\.0\.final_layer_norm\.(weight|bias)$",
           r"encoder_backbone/final_layer_norm/\1")
    r.rule(r"^encoder\.1\.(weight|bias)$", r"encoder_out/\1")
    r.rule(r"^quantizer\.quantizers\.0\.(in_project|out_project)\.(weight|bias)$",
           r"quantizer/\1/\2")
    r.rule(r"^quantizer\.quantizers\.0\.codebook\.weight$", r"quantizer/codebook")
    return r


def convert_repcodec(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    return {"params": convert(sd, repcodec_renamer())}


# ---------------------------------------------------------------------------
# w2v-bert-2.0 (HF `Wav2Vec2BertModel`)
# ---------------------------------------------------------------------------

def w2v_bert_renamer(output_layer: int) -> Renamer:
    r = Renamer()
    r.rule(r"^masked_spec_embed$", None)
    r.rule(r"^feature_projection\.layer_norm\.(weight|bias)$", r"fp_layer_norm/\1")
    r.rule(r"^feature_projection\.projection\.(weight|bias)$", r"fp_projection/\1")

    def layer_rule(m):
        idx = int(m.group(1))
        if idx >= output_layer:
            return None  # truncated: layers past the tap are dead weight
        return f"layer_{idx}/{m.group(2).replace('.', '/')}"

    r.rule(r"^encoder\.layers\.(\d+)\.(.+?)\.?$",
           lambda m: layer_rule(m))
    return r


def convert_w2v_bert(sd: Mapping[str, np.ndarray], output_layer: int = 17) -> Dict[str, Any]:
    sd = {k.replace("self_attn.distance_embedding.weight",
                    "self_attn.distance_embedding"): v for k, v in sd.items()}
    return {"params": convert(sd, w2v_bert_renamer(output_layer))}


# ---------------------------------------------------------------------------
# UnifiedVoice GPT (reference `indextts/gpt/model_v2.py`)
# ---------------------------------------------------------------------------

def _add_conformer_rules(r: Renamer, src: str, dst: str) -> None:
    """Rules for a wenet ConformerEncoder subtree (`conformer_encoder.py`)."""
    # Conv2dSubsampling{2,4,6,8}: torch Sequential interleaves ReLU, so conv
    # stage i lives at `embed.conv.{2i}`; flax names stage 0 `sub_conv_*` and
    # stage i>0 `sub_conv{i}_*` (models/gpt/conformer.py)
    def sub_conv(m):
        stage = int(m.group(1)) // 2
        tag = "" if stage == 0 else str(stage)
        return f"{dst}/sub_conv{tag}_{m.group(2)}"

    r.rule(rf"^{src}\.embed\.conv\.(\d+)\.(weight|bias)$", sub_conv)
    r.rule(rf"^{src}\.embed\.out\.0\.(weight|bias)$", rf"{dst}/sub_out/\1")
    # Conv2dSubsampling6/8 name the output projection `linear`, not `out.0`
    r.rule(rf"^{src}\.embed\.linear\.(weight|bias)$", rf"{dst}/sub_out/\1")
    r.rule(rf"^{src}\.embed\.out\.1\.(weight|bias)$", rf"{dst}/sub_norm/\1")
    r.rule(rf"^{src}\.embed\.pos_enc\..*$", None)
    r.rule(rf"^{src}\.encoders\.(\d+)\.self_attn\.(linear_(?:q|k|v|out|pos))\.(weight|bias)$",
           rf"{dst}/layer_\1/self_attn/\2/\3")
    r.rule(rf"^{src}\.encoders\.(\d+)\.self_attn\.(pos_bias_[uv])$",
           rf"{dst}/layer_\1/self_attn/\2")
    r.rule(rf"^{src}\.encoders\.(\d+)\.feed_forward\.w_1\.(weight|bias)$",
           rf"{dst}/layer_\1/ff_w1/\2")
    r.rule(rf"^{src}\.encoders\.(\d+)\.feed_forward\.w_2\.(weight|bias)$",
           rf"{dst}/layer_\1/ff_w2/\2")
    r.rule(rf"^{src}\.encoders\.(\d+)\.conv_module\.(pointwise_conv1|depthwise_conv|pointwise_conv2)\.(weight|bias)$",
           rf"{dst}/layer_\1/conv_module/\2/\3")
    r.rule(rf"^{src}\.encoders\.(\d+)\.conv_module\.norm\.(weight|bias)$",
           rf"{dst}/layer_\1/conv_module/norm/\2")
    r.rule(rf"^{src}\.encoders\.(\d+)\.(norm_(?:mha|conv|ff|final))\.(weight|bias)$",
           rf"{dst}/layer_\1/\2/\3")
    r.rule(rf"^{src}\.after_norm\.(weight|bias)$", rf"{dst}/after_norm/\1")


def _add_perceiver_rules(r: Renamer, src: str, dst: str) -> None:
    """Rules for a PerceiverResampler subtree (`perceiver.py:224-281`)."""
    r.rule(rf"^{src}\.latents$", rf"{dst}/latents")
    r.rule(rf"^{src}\.proj_context\.(weight|bias)$", rf"{dst}/proj_context/\1")
    r.rule(rf"^{src}\.layers\.(\d+)\.0\.(to_q|to_kv|to_out)\.weight$",
           rf"{dst}/attn_\1/\2/weight")
    r.rule(rf"^{src}\.layers\.(\d+)\.1\.0\.(weight|bias)$",
           rf"{dst}/ff_\1/proj_in/\2")
    r.rule(rf"^{src}\.layers\.(\d+)\.1\.2\.(weight|bias)$",
           rf"{dst}/ff_\1/proj_out/\2")
    r.rule(rf"^{src}\.norm\.gamma$", rf"{dst}/norm/gamma")


def unified_voice_renamer() -> Renamer:
    r = Renamer()
    r.rule(r"^inference_model\..*", None)       # weight-shared wrapper
    r.rule(r"^gpt\.wte\..*", None)              # alias of mel_embedding
    r.rule(r"^gpt\.h\.\d+\.attn\.(bias|masked_bias)$", None)  # mask buffers
    r.rule(r"^(cond_mask_pad|emo_cond_mask_pad)\..*", None)
    _add_conformer_rules(r, "conditioning_encoder", "conditioning_encoder")
    # condition_type="perceiver" branch (ctor default, `model_v2.py:349-350`):
    # Conv1d stem + AttentionBlocks instead of the conformer
    r.rule(r"^conditioning_encoder\.init\.(weight|bias)$",
           r"conditioning_encoder/init/\1")
    r.rule(r"^conditioning_encoder\.attn\.(\d+)\.(norm|qkv|proj_out)\.(weight|bias)$",
           r"conditioning_encoder/attn_\1/\2/\3")
    _add_perceiver_rules(r, "perceiver_encoder", "perceiver_encoder")
    _add_conformer_rules(r, "emo_conditioning_encoder", "emo_conditioning_encoder")
    _add_perceiver_rules(r, "emo_perceiver_encoder", "emo_perceiver_encoder")
    r.rule(r"^(text_embedding|mel_embedding|speed_emb)\.weight$", r"\1/weight")
    r.rule(r"^(text_pos_embedding|mel_pos_embedding)\.emb\.weight$", r"\1/weight")
    r.rule(r"^(emovec_layer|emo_layer|text_head|mel_head)\.(weight|bias)$", r"\1/\2")
    r.rule(r"^final_norm\.(weight|bias)$", r"final_norm/\1")
    r.rule(r"^gpt\.h\.(\d+)\.ln_(1|2)\.(weight|bias)$", r"gpt/h_\1/ln_\2/\3")
    r.rule(r"^gpt\.h\.(\d+)\.attn\.c_(attn|proj)\.(weight|bias)$",
           r"gpt/h_\1/attn_c_\2/\3")
    r.rule(r"^gpt\.h\.(\d+)\.mlp\.c_(fc|proj)\.(weight|bias)$",
           r"gpt/h_\1/mlp_c_\2/\3")
    r.rule(r"^gpt\.ln_f\.(weight|bias)$", r"gpt/ln_f/\1")
    return r


def convert_unified_voice(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    return {"params": convert(sd, unified_voice_renamer())}


# ---------------------------------------------------------------------------
# s2mel / MyModel (reference `s2mel/modules/commons.py:388-438` + DiT + WN)
# ---------------------------------------------------------------------------

def s2mel_renamer(num_sampling_ratios: int) -> Renamer:
    r = Renamer()
    # dead-at-inference / recomputed pieces
    r.rule(r".*t_embedder\d*\.freqs$", None)
    r.rule(r"^models\.cfm\.estimator\.input_pos$", None)
    r.rule(r"^models\.cfm\.estimator\.x_embedder\..*", None)
    r.rule(r"^models\.cfm\.estimator\.(cond_embedder|content_mask_embedder)\..*", None)
    r.rule(r"^models\.length_regulator\.(embedding\.weight|mask_token)$", None)

    r.rule(r"^models\.gpt_layer\.(\d)\.(weight|bias)$", r"gpt_layer_\1/\2")
    r.rule(r"^models\.length_regulator\.content_in_proj\.(weight|bias)$",
           r"length_regulator/content_in_proj/\1")

    def lr_model(m):
        idx, leaf = int(m.group(1)), m.group(2)
        if idx == 3 * num_sampling_ratios:
            return f"length_regulator/conv_out/{leaf}"
        if idx % 3 == 0:
            return f"length_regulator/conv_{idx // 3}/{leaf}"
        if idx % 3 == 1:
            return f"length_regulator/norm_{idx // 3}/{leaf}"
        raise KeyError(f"unexpected length_regulator.model index {idx}")

    r.rule(r"^models\.length_regulator\.model\.(\d+)\.(weight|bias)$", lr_model)

    e = r"^models\.cfm\.estimator\."
    r.rule(e + r"t_embedder\.mlp\.(\d)\.(weight|bias)$", r"estimator/t_embedder/mlp_\1/\2")
    r.rule(e + r"t_embedder2\.mlp\.(\d)\.(weight|bias)$", r"estimator/t_embedder2/mlp_\1/\2")
    r.rule(e + r"transformer\.layers\.(\d+)\.attention\.(wqkv|wo)\.weight$",
           r"estimator/block_\1/\2/weight")
    r.rule(e + r"transformer\.layers\.(\d+)\.feed_forward\.(w[123])\.weight$",
           r"estimator/block_\1/\2/weight")
    r.rule(e + r"transformer\.layers\.(\d+)\.(attention_norm|ffn_norm)\.project_layer\.(weight|bias)$",
           r"estimator/block_\1/\2/project_layer/\3")
    r.rule(e + r"transformer\.layers\.(\d+)\.(attention_norm|ffn_norm)\.norm\.weight$",
           r"estimator/block_\1/\2/norm/weight")
    r.rule(e + r"transformer\.norm\.project_layer\.(weight|bias)$",
           r"estimator/transformer_norm/project_layer/\1")
    r.rule(e + r"transformer\.norm\.norm\.weight$", r"estimator/transformer_norm/norm/weight")
    r.rule(e + r"(cond_projection|cond_x_merge_linear|skip_linear|conv1|res_projection)\.(weight|bias)$",
           r"estimator/\1/\2")
    r.rule(e + r"conv2\.(weight|bias)$", r"estimator/conv2/\1")
    r.rule(e + r"final_layer\.adaLN_modulation\.1\.(weight|bias)$",
           r"estimator/final_layer/adaLN_1/\1")
    r.rule(e + r"final_layer\.linear\.(weight|bias)$", r"estimator/final_layer/linear/\1")
    r.rule(e + r"wavenet\.in_layers\.(\d+)\.conv\.conv\.(weight|bias)$",
           r"estimator/wavenet/in_layer_\1/conv/\2")
    r.rule(e + r"wavenet\.res_skip_layers\.(\d+)\.conv\.conv\.(weight|bias)$",
           r"estimator/wavenet/res_skip_\1/conv/\2")
    r.rule(e + r"wavenet\.cond_layer\.conv\.conv\.(weight|bias)$",
           r"estimator/wavenet/cond_layer/conv/\1")
    return r


def convert_s2mel(sd: Mapping[str, np.ndarray],
                  num_sampling_ratios: int = 2) -> Dict[str, Any]:
    return {"params": convert(sd, s2mel_renamer(num_sampling_ratios))}


# ---------------------------------------------------------------------------
# Qwen2/Qwen3 causal LM (emotion classifier, reference `infer_v2.py:795-906`)
# ---------------------------------------------------------------------------

def qwen_renamer() -> Renamer:
    r = Renamer()
    r.rule(r"^model\.embed_tokens\.weight$", r"embed_tokens/weight")
    r.rule(r"^model\.layers\.(\d+)\.input_layernorm\.weight$",
           r"layer_\1/input_layernorm/weight")
    r.rule(r"^model\.layers\.(\d+)\.post_attention_layernorm\.weight$",
           r"layer_\1/post_attention_layernorm/weight")
    r.rule(r"^model\.layers\.(\d+)\.self_attn\.([qkvo]_proj)\.(weight|bias)$",
           r"layer_\1/\2/\3")
    r.rule(r"^model\.layers\.(\d+)\.self_attn\.([qk]_norm)\.weight$",
           r"layer_\1/\2/weight")
    r.rule(r"^model\.layers\.(\d+)\.mlp\.(gate_proj|up_proj|down_proj)\.weight$",
           r"layer_\1/\2/weight")
    r.rule(r"^model\.norm\.weight$", r"norm/weight")
    r.rule(r"^lm_head\.weight$", r"lm_head/weight")
    r.rule(r"^model\.rotary_emb\..*", None)
    return r


def convert_qwen(sd: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    return {"params": convert(sd, qwen_renamer())}
