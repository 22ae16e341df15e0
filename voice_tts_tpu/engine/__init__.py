from voice_tts_tpu.engine.engine import TTSEngine, InferenceResult

__all__ = ["TTSEngine", "InferenceResult"]
