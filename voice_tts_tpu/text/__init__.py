from voice_tts_tpu.text.tokenizer import SentencePieceBPE, TextTokenizer
from voice_tts_tpu.text.normalizer import TextNormalizer
from voice_tts_tpu.text.emotion import (
    EMOTIONS, create_emotion_vector, normalize_emotion_label,
)

__all__ = ["SentencePieceBPE", "TextTokenizer", "TextNormalizer", "EMOTIONS",
           "create_emotion_vector", "normalize_emotion_label"]
