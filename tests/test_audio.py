"""Golden-numerics tests for the log-mel frontend (SURVEY.md §4 item 1).

The STFT is checked against numpy's FFT (an independent algorithm); the mel
filterbank against analytic properties of the Slaney construction and against
torch.stft for the full power-spectrum path; prep_audio shape/semantics against
the reference's documented formulas (src/audio.rs:27-33, 42, 48-53).
"""

import math

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from whisper_tpu.config import HOP_LENGTH, N_FFT, N_MELS
from whisper_tpu.ops import audio


def _waveform(rng, n, batch=1):
    return rng.standard_normal((batch, n)).astype(np.float32) * 0.1


class TestSTFT:
    def test_matches_numpy_rfft(self, rng):
        """GEMM-DFT vs np.fft.rfft on reflection-padded, Hann-windowed frames."""
        x = _waveform(rng, 4000)
        real, imag = audio.stft(jnp.asarray(x))
        real, imag = np.asarray(real), np.asarray(imag)

        pad = N_FFT // 2
        xp = np.pad(x[0], pad, mode="reflect")
        n_frames = (len(xp) - N_FFT) // HOP_LENGTH + 1
        w = np.sin(np.arange(N_FFT) * math.pi / N_FFT) ** 2
        for t in [0, 1, n_frames // 2, n_frames - 1]:
            frame = xp[t * HOP_LENGTH : t * HOP_LENGTH + N_FFT] * w
            spec = np.fft.rfft(frame)
            np.testing.assert_allclose(real[0, :, t], spec.real, atol=2e-3)
            np.testing.assert_allclose(imag[0, :, t], spec.imag, atol=2e-3)

    def test_matches_torch_stft(self, rng):
        """Full path vs torch.stft(center=True, pad_mode='reflect')."""
        x = _waveform(rng, 6400)
        real, imag = audio.stft(jnp.asarray(x))
        window = torch.from_numpy(
            (np.sin(np.arange(N_FFT) * math.pi / N_FFT) ** 2).astype(np.float32)
        )
        ts = torch.stft(
            torch.from_numpy(x[0]),
            n_fft=N_FFT,
            hop_length=HOP_LENGTH,
            window=window,
            center=True,
            pad_mode="reflect",
            return_complex=True,
        ).numpy()
        np.testing.assert_allclose(np.asarray(real[0]), ts.real, atol=2e-3)
        np.testing.assert_allclose(np.asarray(imag[0]), ts.imag, atol=2e-3)

    def test_shapes(self, rng):
        x = _waveform(rng, 16000, batch=2)
        real, imag = audio.stft(jnp.asarray(x))
        n_frames = (16000 + N_FFT - N_FFT) // HOP_LENGTH + 1
        assert real.shape == (2, N_FFT // 2 + 1, n_frames)
        assert imag.shape == real.shape


class TestMelFilters:
    def test_analytic_properties(self):
        m = np.asarray(audio.mel_filters(16000.0))
        assert m.shape == (N_MELS, N_FFT // 2 + 1)
        assert (m >= 0).all()
        # Every filter is non-empty at 16 kHz / 80 mels.
        assert (m.max(axis=1) > 0).all()
        # Slaney normalization: peak of filter i ~= 2/(mel_f[i+2]-mel_f[i]);
        # equivalently the weighted area under each (triangular) filter in Hz
        # is ~1 within discretization error.
        freqs = np.arange(N_FFT // 2 + 1) * (16000.0 / N_FFT)
        df = freqs[1] - freqs[0]
        areas = m.sum(axis=1) * df
        assert (np.abs(areas[5:] - 1.0) < 0.15).all()

    def test_breakpoints(self):
        """First mel breakpoints are linearly spaced at (200/3)*k Hz below 1 kHz."""
        f_sp = 200.0 / 3.0
        n_pts = N_MELS + 2
        max_mel = audio._hz_to_mel(8000.0)
        mel_step = max_mel / (n_pts - 1)
        # Peak frequency of filter i is mel_to_hz((i+1)*mel_step).
        m = np.asarray(audio.mel_filters(16000.0))
        freqs = np.arange(N_FFT // 2 + 1) * (16000.0 / N_FFT)
        for i in [0, 10, 20]:
            expected = audio._mel_to_hz(np.array([(i + 1) * mel_step]))[0]
            peak = freqs[m[i].argmax()]
            assert abs(peak - expected) < 16000.0 / N_FFT + 1e-6


class TestPrepAudio:
    def test_shape_and_frame_count(self, rng):
        n = audio.max_waveform_samples(100)
        x = _waveform(rng, n)
        mel = audio.prep_audio(jnp.asarray(x))
        assert mel.shape == (1, N_MELS, audio.num_frames(n))
        assert mel.shape[2] <= 100

    def test_128_mel_frontend(self, rng):
        """large-v3 family: 128-mel filterbank through the same pipeline
        (capability beyond the reference's fixed-80 frontend,
        src/audio.rs:44-46)."""
        n = audio.max_waveform_samples(50)
        x = _waveform(rng, n)
        mel = audio.prep_audio(jnp.asarray(x), n_mels=128)
        assert mel.shape == (1, 128, audio.num_frames(n))
        m = np.asarray(audio.mel_filters(16000.0, n_mels=128))
        assert m.shape[0] == 128
        # Slaney analytic properties hold at 128 exactly as at 80
        assert (m >= 0).all() and np.isfinite(m).all()
        assert (m.sum(axis=1) > 0).all()  # every filter is non-empty

    def test_max_waveform_samples_bound(self):
        # Reference formula: HOP*(n+1) + is_odd(N_FFT) - 1 (src/audio.rs:12-17).
        for n_frame_max in [10, 100, 1490]:
            n = audio.max_waveform_samples(n_frame_max)
            assert audio.num_frames(n) <= n_frame_max
            assert audio.num_frames(n + HOP_LENGTH) > n_frame_max

    def test_log_clamp_and_scale(self, rng):
        """Output = (max(log10(max(mel,1e-10)), gmax-8)+4)/4 (src/audio.rs:48-53)."""
        x = _waveform(rng, 8000)
        out = np.asarray(audio.prep_audio(jnp.asarray(x)))
        # invert the scale: log_spec in [gmax-8, gmax]
        log_spec = out * 4.0 - 4.0
        gmax = log_spec.max()
        assert log_spec.min() >= gmax - 8.0 - 1e-5

    def test_silence(self):
        x = np.zeros((1, 8000), dtype=np.float32)
        out = np.asarray(audio.prep_audio(jnp.asarray(x)))
        # All-zero input: mel=0 -> clamped to 1e-10 -> log10=-10 -> gmax=-10
        # -> clamp at -18 no-op -> (x+4)/4 = -1.5 everywhere.
        np.testing.assert_allclose(out, -1.5, atol=1e-5)

    def test_per_sample_max_matches_singleton(self, rng):
        """Batched per-sample mode == running each sample alone."""
        a = _waveform(rng, 8000)
        b = _waveform(rng, 8000) * 10.0
        batch = np.concatenate([a, b], axis=0)
        out = np.asarray(audio.prep_audio(jnp.asarray(batch), per_sample_max=True))
        out_a = np.asarray(audio.prep_audio(jnp.asarray(a)))
        out_b = np.asarray(audio.prep_audio(jnp.asarray(b)))
        np.testing.assert_allclose(out[0], out_a[0], atol=1e-6)
        np.testing.assert_allclose(out[1], out_b[0], atol=1e-6)
