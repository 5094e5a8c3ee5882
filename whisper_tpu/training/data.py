"""Training data pipeline: (audio, text) pairs -> fixed-shape Batches.

New capability beyond the reference (inference-only, SURVEY.md TL;DR).
Design goals, TPU-first:

  * FIXED shapes: every batch is (B, n_mels, T_ctx) mel x (B, S_ctx) tokens,
    so the jitted train step compiles once. Waveforms are padded/truncated
    to the full encoder context, token rows to the full decoder context.
  * the loss mask scores exactly the teacher-forced text + EOT predictions,
    never the prompt or padding (train.Batch contract, training/train.py);
  * SpecAugment runs in-graph (pure jnp, jit/vmap-safe) so augmentation
    rides the same XLA program as the loss, not a host-side preprocessing
    pass.

The manifest/LibriSpeech iterators are shared with `cli eval`
(eval/wer.py::iter_manifest / iter_librispeech).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import SAMPLE_RATE, WhisperConfig
from ..ops.audio import max_waveform_samples, prep_audio
from ..text.tokenizer import WhisperTokenizer
from .train import Batch


def encode_example(
    text: str,
    tok: WhisperTokenizer,
    n_text_ctx: int,
    lang: str = "en",
    task: str = "transcribe",
) -> Tuple[np.ndarray, np.ndarray]:
    """One transcript -> (tokens, loss_mask), both (n_text_ctx,).

    tokens = [SOT, lang, task, notimestamps] + text + [EOT] + pad(EOT).
    mask[t] = 1 iff the prediction of tokens[t+1] is scored: the positions
    from the last prompt token through the token before EOT (scoring the
    text and the EOT emission), 0 on prompt/pad (train.Batch contract).

    Raises ValueError when the example does not fit the decoder context
    (callers should filter or split long transcripts).
    """
    prompt = tok.prompt_ids(lang, task)
    body = tok.encode(text)
    seq = list(prompt) + list(body) + [tok.eot]
    if len(seq) > n_text_ctx:
        raise ValueError(
            f"example needs {len(seq)} tokens > n_text_ctx={n_text_ctx}")
    tokens = np.full((n_text_ctx,), tok.eot, np.int32)
    tokens[: len(seq)] = seq
    mask = np.zeros((n_text_ctx,), np.float32)
    # positions predicting body[0] .. EOT: indices len(prompt)-1 .. len(seq)-2
    mask[len(prompt) - 1: len(seq) - 1] = 1.0
    return tokens, mask


def build_batch(
    waveforms: Sequence[np.ndarray],
    texts: Sequence[str],
    tok: WhisperTokenizer,
    cfg: WhisperConfig,
    lang: str = "en",
    task: str = "transcribe",
) -> Batch:
    """Pad/truncate waveforms to the full encoder context, encode texts.

    Waveforms are float32 @ 16 kHz. Longer audio is TRUNCATED to one
    window (standard Whisper fine-tuning trains on <=30 s clips).
    """
    if len(waveforms) != len(texts):
        raise ValueError("waveforms and texts must pair up")
    n_samples = max_waveform_samples(cfg.encoder_ctx_size)
    waves = np.zeros((len(waveforms), n_samples), np.float32)
    for i, w in enumerate(waveforms):
        w = np.asarray(w, np.float32)[:n_samples]
        waves[i, : len(w)] = w
    mel = prep_audio(jnp.asarray(waves), per_sample_max=True,
                     n_mels=cfg.n_mels)

    rows = [encode_example(t, tok, cfg.decoder_ctx_size, lang, task)
            for t in texts]
    tokens = np.stack([r[0] for r in rows])
    mask = np.stack([r[1] for r in rows])
    return Batch(mel=mel, tokens=jnp.asarray(tokens),
                 loss_mask=jnp.asarray(mask))


# ---------------------------------------------------------------------------
# SpecAugment (Park et al. 2019): frequency + time masking, in-graph.
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig:
    n_freq_masks: int = 2
    freq_mask_width: int = 27       # mel bins, F in the paper (LibriSpeech)
    n_time_masks: int = 2
    time_mask_width: int = 100      # mel frames (= 1 s at 10 ms hop)


def spec_augment(
    mel: jax.Array,               # (B, n_mels, T)
    rng: jax.Array,
    cfg: SpecAugmentConfig = SpecAugmentConfig(),
) -> jax.Array:
    """Mask random frequency bands and time spans with the per-sample mel
    mean (masking to the mean, not zero: the log-mel floor is data-dependent
    after the reference's max-8 clamp).

    Pure jnp with static mask counts: jit/vmap-safe, no dynamic shapes.
    """
    b, n_mels, t = mel.shape
    fill = jnp.mean(mel, axis=(1, 2), keepdims=True)

    def band_mask(key, size: int, width: int, count: int) -> jax.Array:
        """(B, size) bool: union of `count` random [start, start+w) bands."""
        kw, ks = jax.random.split(key)
        w = jax.random.randint(kw, (count, b), 0, width + 1)
        start = jax.random.randint(
            ks, (count, b), 0, jnp.maximum(size - w + 1, 1))
        pos = jnp.arange(size)
        m = (pos[None, None, :] >= start[:, :, None]) & (
            pos[None, None, :] < (start + w)[:, :, None])
        return m.any(axis=0)  # (B, size)

    kf, kt = jax.random.split(rng)
    fmask = band_mask(kf, n_mels, cfg.freq_mask_width, cfg.n_freq_masks)
    tmask = band_mask(kt, t, cfg.time_mask_width, cfg.n_time_masks)
    masked = fmask[:, :, None] | tmask[:, None, :]
    return jnp.where(masked, fill, mel)


# ---------------------------------------------------------------------------
# Dataset iteration
# ---------------------------------------------------------------------------

def load_examples(
    items: Iterable[Tuple[str, str]],
    limit: Optional[int] = None,
    resample_to: int = SAMPLE_RATE,
) -> List[Tuple[np.ndarray, str]]:
    """(audio_path, transcript) pairs -> [(waveform16k, transcript)].

    Decodes WAV/FLAC via the native loader (Python fallback) and resamples
    when needed.
    """
    from ..io import native as wav_native, wav as pywav

    out: List[Tuple[np.ndarray, str]] = []
    for i, (path, text) in enumerate(items):
        if limit is not None and i >= limit:
            break
        wave, rate = wav_native.load_audio(path)
        if rate != resample_to:
            wave = pywav.resample(wave, rate, resample_to)
        out.append((wave, text))
    return out


def iter_batches(
    examples: Sequence[Tuple[np.ndarray, str]],
    tok: WhisperTokenizer,
    cfg: WhisperConfig,
    batch_size: int,
    lang: str = "en",
    task: str = "transcribe",
    seed: int = 0,
    epochs: Optional[int] = None,
) -> Iterator[Batch]:
    """Shuffled fixed-size batches, reshuffling each epoch; drops examples
    that exceed the decoder context (with one warning) and the final ragged
    batch (fixed shapes keep ONE compiled step).
    """
    from ..utils.logging import get_logger

    log = get_logger("training.data")
    keep: List[Tuple[np.ndarray, str]] = []
    dropped = 0
    for wave, text in examples:
        try:
            encode_example(text, tok, cfg.decoder_ctx_size, lang, task)
        except ValueError:
            dropped += 1
            continue
        keep.append((wave, text))
    if dropped:
        log.warning("dropped %d/%d examples exceeding n_text_ctx=%d",
                    dropped, len(examples), cfg.decoder_ctx_size)
    if len(keep) < batch_size:
        raise ValueError(
            f"{len(keep)} usable examples < batch_size={batch_size}")

    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(keep))
        for i in range(0, len(keep) - batch_size + 1, batch_size):
            idx = order[i: i + batch_size]
            yield build_batch(
                [keep[j][0] for j in idx], [keep[j][1] for j in idx],
                tok, cfg, lang, task)
        epoch += 1
