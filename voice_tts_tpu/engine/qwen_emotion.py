"""Text -> emotion-vector analysis via a Qwen chat model.

Behaviour parity with reference `QwenEmotion` (`infer_v2.py:795-906`):
"文本情感分类" system prompt, JSON parse with regex fallback, the
sad<->melancholic swap workaround, 0..1.2 clamping, calm fallback, canonical
zh key order.  The LM runs as a JAX greedy decode
(`voice_tts_tpu.models.qwen`); the HF tokenizer is loaded from the local
model directory (no network).
"""

from __future__ import annotations

import json
import re
from typing import Dict, Optional

import numpy as np

from voice_tts_tpu.config import QwenEmoConfig

CN_KEY_TO_EN = {
    "高兴": "happy", "愤怒": "angry", "悲伤": "sad", "恐惧": "afraid",
    "反感": "disgusted", "低落": "melancholic", "惊讶": "surprised",
    "自然": "calm",
}
DESIRED_ORDER = ["高兴", "愤怒", "悲伤", "恐惧", "反感", "低落", "惊讶", "自然"]
MELANCHOLIC_WORDS = {"低落", "melancholy", "melancholic", "depression",
                     "depressed", "gloomy"}
MAX_SCORE, MIN_SCORE = 1.2, 0.0


def parse_emotion_response(content: str, text_input: str) -> Dict[str, float]:
    """JSON (or regex-salvaged) response -> ordered english emotion dict."""
    try:
        parsed = json.loads(content)
    except json.JSONDecodeError:
        parsed = {m.group(1): float(m.group(2))
                  for m in re.finditer(r'([^\s":.,]+?)"?\s*:\s*([\d.]+)', content)}

    # sad <-> melancholic swap when melancholic cue words present
    lower = text_input.lower()
    if any(w in lower for w in MELANCHOLIC_WORDS):
        parsed["悲伤"], parsed["低落"] = parsed.get("低落", 0.0), parsed.get("悲伤", 0.0)

    out = {CN_KEY_TO_EN[k]: max(MIN_SCORE, min(MAX_SCORE, float(parsed.get(k, 0.0))))
           for k in DESIRED_ORDER}
    if all(v <= 0.0 for v in out.values()):
        out["calm"] = 1.0
    return out


class QwenEmotion:
    """Wraps the JAX Qwen LM + HF tokenizer into the reference interface."""

    PROMPT = "文本情感分类"

    def __init__(self, cfg: QwenEmoConfig, model, params, tokenizer,
                 prompt_bucket: int = 128):
        self.cfg = cfg
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.prompt_bucket = prompt_bucket

    @classmethod
    def from_pretrained(cls, model_dir: str, cfg: Optional[QwenEmoConfig] = None):
        """Load + convert a local HF Qwen2/Qwen3 checkpoint directory."""
        import glob
        import os

        from transformers import AutoConfig, AutoTokenizer

        from voice_tts_tpu.models.qwen import QwenArch, QwenLM
        from voice_tts_tpu.utils.checkpoint import convert_qwen, load_state_dict

        hf_cfg = AutoConfig.from_pretrained(model_dir)
        arch = QwenArch(
            vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
            num_layers=hf_cfg.num_hidden_layers,
            num_heads=hf_cfg.num_attention_heads,
            num_kv_heads=hf_cfg.num_key_value_heads,
            head_dim=getattr(hf_cfg, "head_dim",
                             hf_cfg.hidden_size // hf_cfg.num_attention_heads),
            intermediate_size=hf_cfg.intermediate_size,
            rope_theta=getattr(hf_cfg, "rope_theta", 1e6),
            rms_eps=getattr(hf_cfg, "rms_norm_eps", 1e-6),
            qkv_bias=hf_cfg.model_type == "qwen2",
            qk_norm=hf_cfg.model_type == "qwen3",
            tie_embeddings=getattr(hf_cfg, "tie_word_embeddings", True),
        )
        sd = {}
        for path in sorted(glob.glob(os.path.join(model_dir, "*.safetensors"))):
            sd.update(load_state_dict(path))
        if not sd:
            for path in sorted(glob.glob(os.path.join(model_dir, "*.bin"))):
                sd.update(load_state_dict(path))
        params = convert_qwen(sd)
        tokenizer = AutoTokenizer.from_pretrained(model_dir)
        return cls(cfg or QwenEmoConfig(), QwenLM(arch), params, tokenizer)

    def _chat_tokens(self, text_input: str):
        messages = [
            {"role": "system", "content": self.PROMPT},
            {"role": "user", "content": text_input},
        ]
        try:
            text = self.tokenizer.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True,
                enable_thinking=False)
        except TypeError:
            text = self.tokenizer.apply_chat_template(
                messages, tokenize=False, add_generation_prompt=True)
        return self.tokenizer(text)["input_ids"]

    def inference(self, text_input: str) -> Dict[str, float]:
        import jax.numpy as jnp

        from voice_tts_tpu.models.qwen import qwen_greedy_decode

        ids = self._chat_tokens(text_input)
        bucket = self.prompt_bucket
        while bucket < len(ids):
            bucket *= 2
        tokens = np.full((1, bucket), self.tokenizer.eos_token_id, np.int32)
        tokens[0, bucket - len(ids):] = ids  # left-padded
        out = qwen_greedy_decode(
            self.params, self.model, jnp.asarray(tokens),
            jnp.asarray([len(ids)]), self.cfg.max_new_tokens,
            int(self.tokenizer.eos_token_id))
        out_ids = np.asarray(out)[0].tolist()
        if self.tokenizer.eos_token_id in out_ids:
            out_ids = out_ids[: out_ids.index(self.tokenizer.eos_token_id)]
        content = self.tokenizer.decode(out_ids, skip_special_tokens=True)
        # strip <think> blocks if the model emits them
        content = re.sub(r"<think>.*?</think>", "", content, flags=re.S).strip()
        return parse_emotion_response(content, text_input)
