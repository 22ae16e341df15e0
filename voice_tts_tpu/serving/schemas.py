"""Request/response schemas — verbatim field parity with the reference API
(`server.py:183-243`)."""

from __future__ import annotations

from typing import Dict, Optional, Union

from pydantic import BaseModel, Field, field_validator


class TTSRequest(BaseModel):
    text: str = Field(..., description="text to synthesize")
    spk_audio: str = Field(..., description="speaker reference audio (URL or hex)")
    emo_audio: Optional[str] = Field(None, description="emotion reference audio")
    emotion: Optional[Union[str, Dict[str, float]]] = Field(
        None, description="emotion label or {label: weight} dict")
    emo_alpha: float = Field(default=1.0, description="emotion strength 0..1")

    @field_validator("emo_alpha")
    @classmethod
    def validate_emo_alpha(cls, v):
        if not 0.0 <= v <= 1.0:
            raise ValueError("emo_alpha must be between 0.0 and 1.0")
        return v

    @field_validator("emotion")
    @classmethod
    def validate_emotion(cls, v):
        if v is None or isinstance(v, str):
            return v
        if isinstance(v, dict):
            for key, value in v.items():
                if not isinstance(key, str):
                    raise ValueError("emotion dict keys must be strings")
                if not isinstance(value, (int, float)):
                    raise ValueError("emotion dict values must be numbers")
                if not 0.0 <= float(value) <= 1.0:
                    raise ValueError("emotion values must be between 0.0 and 1.0")
            return v
        raise ValueError("emotion must be a string or dict")


class TTSResponse(BaseModel):
    audio_hex: str = Field(..., description="hex encoded WAV")
    audio_length: float = Field(..., description="audio length (s)")
    inference_time: float = Field(..., description="inference time (s)")
    rtf: float = Field(..., description="real-time factor")
    text: str = Field(..., description="input text")
