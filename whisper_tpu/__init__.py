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
