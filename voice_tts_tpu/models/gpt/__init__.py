from voice_tts_tpu.models.gpt.unified_voice import UnifiedVoice

__all__ = ["UnifiedVoice"]
