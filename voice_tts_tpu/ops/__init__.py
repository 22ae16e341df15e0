"""TPU compute kernels: fused anti-alias snake activation, attention, KV cache."""

from voice_tts_tpu.ops.aa_activation import aa_snake_activation, kaiser_sinc_filter

__all__ = ["aa_snake_activation", "kaiser_sinc_filter"]
