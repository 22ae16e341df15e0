from voice_tts_tpu.models.s2mel.s2mel import S2Mel

__all__ = ["S2Mel"]
