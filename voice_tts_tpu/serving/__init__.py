from voice_tts_tpu.serving.schemas import TTSRequest, TTSResponse

__all__ = ["TTSRequest", "TTSResponse"]
