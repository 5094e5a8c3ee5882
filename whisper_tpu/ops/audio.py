"""Log-mel spectrogram frontend, TPU-native.

Behavioral parity target: the reference's from-scratch frontend
(whisper-burn `src/audio.rs`): periodic Hann window (`hann_window_device`,
src/audio.rs:272-278), reflection-padded GEMM-DFT STFT (`stfft`,
src/audio.rs:284-367), Slaney-normalized mel filterbank
(`get_mel_filters_device`, src/audio.rs:67-143), and the `prep_audio` log/clamp
pipeline (src/audio.rs:34-56) including its drop-last-frame quirk
(src/audio.rs:42) and the dynamic-range clamp at (global max - 8.0)
(src/audio.rs:50-52).

TPU-first design notes:
  * The DFT is expressed as one large matmul of all frames against a fused
    (n_fft x 2*n_freq) cos/sin basis -- a single MXU-friendly GEMM instead of
    per-frame FFTs, exactly where the FLOPs want to live on TPU.
  * The reference syncs the global max to the host (`into_scalar`,
    src/audio.rs:50); here the clamp stays in-graph so the whole frontend jits.
  * Frame extraction is a static-shape gather; everything is `jit`-able with
    no data-dependent shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..config import HOP_LENGTH, N_FFT, N_MELS

__all__ = [
    "max_waveform_samples",
    "hann_window",
    "mel_filters",
    "stft",
    "prep_audio",
    "num_frames",
]


def max_waveform_samples(n_frame_max: int) -> int:
    """Max number of waveform samples yielding <= n_frame_max mel frames.

    Reference: `max_waveform_samples` (src/audio.rs:12-17):
    HOP_LENGTH * (n_frame_max + 1) + is_odd(N_FFT) - 1, with N_FFT=400 (even).
    """
    return HOP_LENGTH * (n_frame_max + 1) + (N_FFT % 2) - 1


def num_frames(n_samples: int) -> int:
    """Number of mel frames `prep_audio` produces for an n_samples waveform.

    STFT frame count (src/audio.rs:327) minus the dropped last frame
    (src/audio.rs:42). Reflection padding adds n_fft samples (even n_fft).
    """
    n_padded = n_samples + 2 * (N_FFT // 2)
    return (n_padded - N_FFT) // HOP_LENGTH  # == stft frames - 1


def hann_window(window_length: int = N_FFT, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window as sin^2(pi*n/N) (src/audio.rs:272-278)."""
    n = np.arange(window_length, dtype=np.float64)
    w = np.sin(n * math.pi / window_length) ** 2
    return jnp.asarray(w, dtype=dtype)


# ----------------------------------------------------------------------------
# Mel filterbank (librosa-style Slaney, htk=False), computed host-side in
# float64 and baked into the jitted graph as a constant. Reference computes it
# on-device in f32 (src/audio.rs:67-143); values agree to ~1e-7.
# ----------------------------------------------------------------------------


def _hz_to_mel(freq: float, htk: bool = False) -> float:
    """Scalar Hz->mel (src/audio.rs:198-230)."""
    if htk:
        return 2595.0 * math.log10(1.0 + freq / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    if freq >= min_log_hz:
        return min_log_mel + math.log(freq / min_log_hz) / logstep
    return (freq - f_min) / f_sp


def _mel_to_hz(mels: np.ndarray, htk: bool = False) -> np.ndarray:
    """Vector mel->Hz, branchless blend like the reference (src/audio.rs:232-266)."""
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    linear = f_min + f_sp * mels
    log_part = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return np.where(mels >= min_log_mel, log_part, linear)


@functools.lru_cache(maxsize=8)
def _mel_filters_np(
    sample_rate: float, n_fft: int, n_mels: int, htk: bool
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank (n_mels, n_fft//2+1).

    Port of librosa's mel filter construction, matching the reference's
    tensorized version (src/audio.rs:67-143): triangular weights via
    max(0, min(lower, upper)) and 2/(mel_f[i+2]-mel_f[i]) energy norm.
    """
    fmin, fmax = 0.0, sample_rate / 2.0
    n_freq = n_fft // 2 + 1
    fftfreqs = np.arange(n_freq, dtype=np.float64) * (sample_rate / n_fft)

    n_pts = n_mels + 2
    min_mel, max_mel = _hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk)
    mels = np.arange(n_pts, dtype=np.float64) * ((max_mel - min_mel) / (n_pts - 1)) + min_mel
    mel_f = _mel_to_hz(mels, htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:n_mels] / fdiff[:n_mels, None]
    upper = ramps[2 : n_mels + 2] / fdiff[1 : n_mels + 1, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def mel_filters(
    sample_rate: float = 16_000.0,
    n_fft: int = N_FFT,
    n_mels: int = N_MELS,
    htk: bool = False,
    dtype=jnp.float32,
) -> jax.Array:
    return jnp.asarray(_mel_filters_np(float(sample_rate), n_fft, n_mels, htk), dtype)


# ----------------------------------------------------------------------------
# STFT as a single GEMM over all frames.
# ----------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _dft_basis_np(n_fft: int) -> np.ndarray:
    """Windowed DFT basis (n_fft, 2*n_freq): [cos | -sin] columns, pre-scaled
    by the periodic Hann window so framing + window + DFT is one matmul.

    Matches the reference's explicit cos/sin wave matrices (src/audio.rs:348-366)
    with the window folded in (src/audio.rs:359-364).
    """
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freq, dtype=np.float64)
    angle = (2.0 * math.pi / n_fft) * np.outer(n, k)  # (n_fft, n_freq)
    window = np.sin(n * math.pi / n_fft) ** 2
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)
    return (window[:, None] * basis).astype(np.float32)


def _frame(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Extract overlapping frames: (B, T) -> (B, n_frames, n_fft).

    Reflection padding of n_fft//2 on each side, excluding the edge sample,
    exactly like the reference (src/audio.rs:296-306) and np.pad(mode='reflect').
    """
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (xp.shape[1] - n_fft) // hop + 1
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return xp[:, idx]


def stft(
    x: jax.Array, n_fft: int = N_FFT, hop_length: int = HOP_LENGTH
) -> tuple[jax.Array, jax.Array]:
    """STFT of (B, T) waveform -> (real, imag), each (B, n_freq, n_frames).

    Semantics of the reference `stfft` (src/audio.rs:284-367): reflection
    padding, periodic Hann window, explicit DFT matrices. Here the window and
    both DFT matrices are fused into one (n_fft, 2*n_freq) basis so the whole
    transform is a single MXU matmul over all frames.
    """
    if x.shape[-1] < n_fft:
        raise ValueError(f"waveform length {x.shape[-1]} must be >= n_fft={n_fft}")
    n_freq = n_fft // 2 + 1
    frames = _frame(x.astype(jnp.float32), n_fft, hop_length)  # (B, F, n_fft)
    basis = jnp.asarray(_dft_basis_np(n_fft))  # (n_fft, 2*n_freq)
    spec = jax.lax.dot_general(
        frames,
        basis,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, F, 2*n_freq)
    real = jnp.swapaxes(spec[..., :n_freq], 1, 2)
    imag = jnp.swapaxes(spec[..., n_freq:], 1, 2)
    return real, imag


def prep_audio(
    waveform: jax.Array,
    sample_rate: float = 16_000.0,
    per_sample_max: bool = False,
    n_mels: int = N_MELS,
) -> jax.Array:
    """Waveform (B, n_samples) -> log-mel spectrogram (B, n_mels, n_frames).

    `n_mels` selects the filterbank size: 80 (all reference models) or 128
    (large-v3 family -- beyond the reference, whose frontend is fixed at 80,
    src/audio.rs:44-46; the Slaney construction is identical at both sizes).

    Parity target: `prep_audio` (src/audio.rs:34-56):
      1. GEMM-DFT STFT -> power spectrum, drop last frame (src/audio.rs:40-42)
      2. mel filterbank matmul (src/audio.rs:44-46)
      3. log10 clamped at 1e-10 (src/audio.rs:48)
      4. dynamic-range clamp at (max - 8.0) (src/audio.rs:50-52) -- the
         reference computes the max over the WHOLE tensor including batch and
         syncs it to host; we keep it in-graph. `per_sample_max=True` switches
         to per-sample maxima so batched multi-stream results match the
         stream-at-a-time results (new capability; default preserves parity).
      5. scale (x + 4) / 4 (src/audio.rs:53)
    """
    real, imag = stft(waveform)
    power = real * real + imag * imag  # (B, n_freq, F)
    power = power[:, :, :-1]  # drop last frame (src/audio.rs:42)

    mel = mel_filters(sample_rate, n_mels=n_mels)  # (n_mels, n_freq)
    mel_spec = jax.lax.dot_general(
        mel,
        power,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (n_mels, B, F)
    mel_spec = jnp.swapaxes(mel_spec, 0, 1)  # (B, n_mels, F)

    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    if per_sample_max:
        mx = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    else:
        mx = jnp.max(log_spec)
    log_spec = jnp.maximum(log_spec, mx - 8.0)
    return (log_spec + 4.0) / 4.0
