"""whisper_tpu: a TPU-native (JAX/XLA/Pallas/pjit) speech-to-text framework
with the capabilities of Gadersd/whisper-burn."""

__version__ = "0.1.0"

from .config import (
    AudioEncoderConfig,
    KernelKnobs,
    TextDecoderConfig,
    WhisperConfig,
    preset,
)

# Lazy top-level conveniences: `whisper_tpu.Transcriber` etc. without
# importing the full pipeline (and jax tracing machinery) at package import.
_LAZY = {
    "Transcriber": ("whisper_tpu.pipeline.transcribe", "Transcriber"),
    "DecodeOptions": ("whisper_tpu.pipeline.transcribe", "DecodeOptions"),
    "BatchTranscriber": ("whisper_tpu.pipeline.batch", "BatchTranscriber"),
    "StreamingTranscriber": (
        "whisper_tpu.pipeline.streaming", "StreamingTranscriber"),
    "WhisperTokenizer": ("whisper_tpu.text.tokenizer", "WhisperTokenizer"),
}


def __getattr__(name: str):
    target = _LAZY.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    import importlib

    return getattr(importlib.import_module(target[0]), target[1])


def __dir__():
    return sorted(list(globals()) + list(_LAZY))
