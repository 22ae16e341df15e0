from voice_tts_tpu.models.vocoder.bigvgan import BigVGAN

__all__ = ["BigVGAN"]
