from voice_tts_tpu.models.conditioning.campplus import CAMPPlus
from voice_tts_tpu.models.conditioning.repcodec import RepCodec
from voice_tts_tpu.models.conditioning.w2v_bert import Wav2Vec2Bert

__all__ = ["CAMPPlus", "RepCodec", "Wav2Vec2Bert"]
