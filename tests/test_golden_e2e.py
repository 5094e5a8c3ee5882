"""Golden end-to-end gate (BASELINE: tiny.en token-exact on the bundled
audio.wav vs `audio.txt`).

Requires real converted weights, which cannot be downloaded in this offline
environment. Set WHISPER_TPU_REAL_CKPT to a checkpoint (safetensors / npy
tree / .pt) with a tokenizer.json beside it, e.g.:

    python -m whisper_tpu.cli convert-pt tiny.en.pt models/tiny.en
    WHISPER_TPU_REAL_CKPT=models/tiny.en python -m pytest tests/test_golden_e2e.py
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get("WHISPER_TPU_REAL_CKPT")

pytestmark = pytest.mark.skipif(
    CKPT is None,
    reason="WHISPER_TPU_REAL_CKPT not set (real weights unavailable offline)",
)

EXPECTED = (
    "Hello, I am the whisper machine learning model. If you see this as "
    "text then I am working properly."
)


@pytest.fixture(scope="module")
def transcriber():
    from whisper_tpu.io import checkpoint, convert_pt
    from whisper_tpu.pipeline.transcribe import Transcriber
    from whisper_tpu.text.tokenizer import WhisperTokenizer

    if CKPT.endswith((".pt", ".bin")):
        params, cfg = convert_pt.load_pt(CKPT)
    else:
        params, cfg = checkpoint.load_params(CKPT)
    tok_path = os.path.join(os.path.dirname(os.path.abspath(CKPT)),
                            "tokenizer.json")
    # token-exact parity mode: exact-f32 matmuls (the reference computes f32)
    return Transcriber(params, cfg, WhisperTokenizer(tok_path),
                       matmul_precision="highest")


@pytest.fixture(scope="module")
def waveform16k():
    from whisper_tpu.io import wav

    w, rate = wav.load_wav("/root/reference/audio.wav")
    return wav.resample(w, rate, 16000)


def test_golden_transcription(transcriber, waveform16k):
    """Decode config matches the reference: beam=5, max_depth=100, prompt
    [SOT, en, transcribe, notimestamps] (BASELINE.md row 4)."""
    from whisper_tpu.pipeline.transcribe import DecodeOptions

    text, tokens = transcriber.transcribe(
        waveform16k, 16000, DecodeOptions(lang="en"),
        on_chunk=lambda *a: None,
    )
    assert text.strip() == EXPECTED


def test_golden_greedy(transcriber, waveform16k):
    from whisper_tpu.pipeline.transcribe import DecodeOptions

    text, _ = transcriber.transcribe(
        waveform16k, 16000,
        DecodeOptions(lang="en", strategy="greedy", max_depth=224),
        on_chunk=lambda *a: None,
    )
    assert text.strip() == EXPECTED
