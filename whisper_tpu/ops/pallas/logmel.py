"""Fused log-mel frontend kernel (Pallas TPU).

The SURVEY.md C27 native-obligation list names "a fused log-mel frontend
kernel (replacing C4-C6's GEMM-DFT chain)". The XLA path
(`ops.audio.prep_audio`) computes DFT -> HBM spectrum -> power -> HBM -> mel
-> log; this kernel keeps the whole chain for a block of frames in VMEM:

    frames (block_f, 512) @ windowed-DFT basis (512, 512)   [MXU]
      -> power = re^2 + im^2 (lane-aligned halves)           [VPU]
      -> power (block_f, 256) @ mel^T (256, 128)             [MXU]
      -> log10(max(., 1e-10))                                [VPU]

Lane alignment: the 201 real/imag spectrum columns are padded to 256 so the
re/im split lands on a 128-lane boundary; the zero padding contributes zero
power and the padded mel rows/cols are zero, so results equal the reference
math exactly. The final dynamic-range clamp ((max - 8), (x+4)/4,
src/audio.rs:50-53) needs the global max and runs as (cheap) XLA ops on the
(n_mels, F) output.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import HOP_LENGTH, N_FFT, N_MELS
from ..audio import _dft_basis_np, _mel_filters_np

_SPEC_PAD = 256  # 201 freq bins padded to a 128-lane multiple
_FFT_PAD = 512  # 400-sample frames padded for clean tiling
_MEL_PAD = 128  # 80 mel rows padded


@functools.lru_cache(maxsize=2)
def _padded_basis(n_fft: int) -> np.ndarray:
    """(512, 512) windowed DFT basis: cols [0:201]=win*cos, [256:457]=-win*sin."""
    base = _dft_basis_np(n_fft)  # (400, 402) = [cos | -sin], window folded in
    n_freq = n_fft // 2 + 1
    out = np.zeros((_FFT_PAD, 2 * _SPEC_PAD), np.float32)
    out[:n_fft, :n_freq] = base[:, :n_freq]
    out[:n_fft, _SPEC_PAD : _SPEC_PAD + n_freq] = base[:, n_freq:]
    return out


@functools.lru_cache(maxsize=2)
def _padded_mel_t(sample_rate: float) -> np.ndarray:
    """(256, 128) transposed mel filterbank, zero-padded."""
    mel = _mel_filters_np(sample_rate, N_FFT, N_MELS, False)  # (80, 201)
    out = np.zeros((_SPEC_PAD, _MEL_PAD), np.float32)
    out[: mel.shape[1], : mel.shape[0]] = mel.T
    return out


def _logmel_kernel(frames_ref, basis_ref, mel_ref, out_ref):
    frames = frames_ref[:]  # (block_f, 512)
    spec = jax.lax.dot_general(
        frames, basis_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # full-f32 MXU passes: the DFT
        # has large cancellations and log10 amplifies quiet bins
    )  # (block_f, 512)
    re = spec[:, :_SPEC_PAD]
    im = spec[:, _SPEC_PAD:]
    power = re * re + im * im  # (block_f, 256); padded cols are exactly 0
    mel = jax.lax.dot_general(
        power, mel_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (block_f, 128)
    out_ref[:] = jnp.log(jnp.maximum(mel, 1e-10)) * (1.0 / math.log(10.0))


def _frames(x: jax.Array) -> jax.Array:
    """Reflection-padded overlapping frames: (B, T) -> (B, F_stft, 400)."""
    pad = N_FFT // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    n = (xp.shape[1] - N_FFT) // HOP_LENGTH + 1
    idx = jnp.arange(n)[:, None] * HOP_LENGTH + jnp.arange(N_FFT)[None, :]
    return xp[:, idx]


@functools.partial(jax.jit, static_argnames=("sample_rate", "per_sample_max",
                                             "block_f", "interpret"))
def prep_audio_fused(
    waveform: jax.Array,  # (B, n_samples)
    sample_rate: float = 16_000.0,
    per_sample_max: bool = False,
    block_f: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused-kernel version of `ops.audio.prep_audio`."""
    if not interpret and jax.default_backend() != "tpu":
        interpret = True

    b = waveform.shape[0]
    frames = _frames(waveform)  # (B, F_stft, 400)
    f = frames.shape[1] - 1  # drop last frame (src/audio.rs:42)
    frames = frames[:, :f].reshape(b * f, N_FFT)

    total = b * f
    total_pad = pl.cdiv(total, block_f) * block_f
    frames = jnp.pad(frames, ((0, total_pad - total), (0, _FFT_PAD - N_FFT)))

    basis = jnp.asarray(_padded_basis(N_FFT))
    mel_t = jnp.asarray(_padded_mel_t(float(sample_rate)))

    log_spec = pl.pallas_call(
        _logmel_kernel,
        grid=(total_pad // block_f,),
        in_specs=[
            pl.BlockSpec((block_f, _FFT_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_FFT_PAD, 2 * _SPEC_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SPEC_PAD, _MEL_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_f, _MEL_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total_pad, _MEL_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * total_pad * _FFT_PAD * 2 * _SPEC_PAD
            + 2 * total_pad * _SPEC_PAD * _MEL_PAD,
            bytes_accessed=4 * (total_pad * _FFT_PAD + total_pad * _MEL_PAD),
            transcendentals=total_pad * _MEL_PAD,
        ),
        interpret=interpret,
    )(frames, basis, mel_t)

    log_spec = log_spec[:total, :N_MELS].reshape(b, f, N_MELS)
    log_spec = jnp.swapaxes(log_spec, 1, 2)  # (B, n_mels, F)

    if per_sample_max:
        mx = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    else:
        mx = jnp.max(log_spec)
    log_spec = jnp.maximum(log_spec, mx - 8.0)
    return (log_spec + 4.0) / 4.0
