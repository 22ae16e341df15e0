"""Qwen LM parity vs HF Qwen2/Qwen3 + greedy decode consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voice_tts_tpu.engine.qwen_emotion import parse_emotion_response
from voice_tts_tpu.models.qwen import QwenArch, QwenLM, qwen_greedy_decode
from voice_tts_tpu.utils.checkpoint import convert_qwen


def _tiny_hf(model_type="qwen2"):
    import torch
    if model_type == "qwen2":
        from transformers import Qwen2Config, Qwen2ForCausalLM
        cfg = Qwen2Config(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, num_key_value_heads=2,
                          intermediate_size=64, max_position_embeddings=128,
                          rope_theta=10000.0, tie_word_embeddings=True)
        torch.manual_seed(0)
        return Qwen2ForCausalLM(cfg).eval(), cfg
    from transformers import Qwen3Config, Qwen3ForCausalLM
    cfg = Qwen3Config(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      head_dim=8, intermediate_size=64,
                      max_position_embeddings=128, rope_theta=10000.0,
                      tie_word_embeddings=True)
    torch.manual_seed(0)
    return Qwen3ForCausalLM(cfg).eval(), cfg


@pytest.mark.parametrize("model_type", ["qwen2", "qwen3"])
def test_qwen_logits_parity(model_type):
    import torch
    ref, hf_cfg = _tiny_hf(model_type)
    arch = QwenArch(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        num_kv_heads=hf_cfg.num_key_value_heads,
        head_dim=getattr(hf_cfg, "head_dim",
                         hf_cfg.hidden_size // hf_cfg.num_attention_heads),
        intermediate_size=hf_cfg.intermediate_size,
        rope_theta=hf_cfg.rope_theta, rms_eps=hf_cfg.rms_norm_eps,
        qkv_bias=model_type == "qwen2", qk_norm=model_type == "qwen3",
        tie_embeddings=True)
    model = QwenLM(arch)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_qwen(sd)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 120, size=(2, 9)).astype(np.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        ours, _ = model.apply(params, jnp.asarray(tokens))
    import torch
    with torch.no_grad():
        ref_logits = ref(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref_logits, atol=3e-4,
                               rtol=1e-3)


def test_qwen_greedy_decode_matches_hf():
    import torch
    ref, hf_cfg = _tiny_hf("qwen2")
    arch = QwenArch(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=8, intermediate_size=64, rope_theta=10000.0,
        rms_eps=hf_cfg.rms_norm_eps, qkv_bias=True, qk_norm=False)
    model = QwenLM(arch)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_qwen(sd)

    prompt = np.asarray([[5, 17, 33, 2, 98]], dtype=np.int32)
    with torch.no_grad():
        hf_out = ref.generate(torch.from_numpy(prompt.astype(np.int64)),
                              max_new_tokens=6, do_sample=False,
                              eos_token_id=None, pad_token_id=0)
    ref_new = hf_out[0, prompt.shape[1]:].numpy()

    # left-pad into a bucket of 8
    bucket = 8
    toks = np.zeros((1, bucket), np.int32)
    toks[0, bucket - 5:] = prompt[0]
    out = qwen_greedy_decode(params, model, jnp.asarray(toks),
                             jnp.asarray([5]), 6, eos_id=119)
    ours = np.asarray(out)[0]
    np.testing.assert_array_equal(ours[: len(ref_new)], ref_new)


def test_parse_emotion_response():
    out = parse_emotion_response('{"高兴": 0.9, "愤怒": 0.2}', "some text")
    assert out["happy"] == 0.9 and out["angry"] == 0.2 and out["calm"] == 0.0
    # regex fallback
    out = parse_emotion_response('高兴: 0.5, 自然: 0.4 junk', "text")
    assert out["happy"] == 0.5 and out["calm"] == 0.4
    # clamp
    out = parse_emotion_response('{"高兴": 5.0}', "t")
    assert out["happy"] == 1.2
    # all-zero -> calm fallback
    out = parse_emotion_response('{}', "t")
    assert out["calm"] == 1.0
    # melancholic swap
    out = parse_emotion_response('{"悲伤": 0.8}', "feeling depressed today")
    assert out["melancholic"] == 0.8 and out["sad"] == 0.0
