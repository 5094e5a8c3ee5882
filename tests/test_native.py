"""C++ native data-loader tests: builds native/libwhisper_io.so (if g++ is
available) and asserts bit-exact parity with the pure-Python oracle."""

import struct
import subprocess
import wave as wave_mod

import numpy as np
import pytest

import whisper_tpu.io.native as native
from whisper_tpu.io import wav as pywav

NATIVE_DIR = native._LIB_PATH.rsplit("/", 1)[0]


@pytest.fixture(scope="module", autouse=True)
def build_native():
    r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"native build failed: {r.stderr.decode()[:200]}")
    # reload the library in case the module was imported before the build
    native._LIB = native._load_lib()
    if native._LIB is None:
        pytest.skip("libwhisper_io.so did not load")


def _write_wav(path, samples_i16, rate=16000):
    with wave_mod.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples_i16.tobytes())


class TestNativeWav:
    def test_bit_exact_vs_python(self, tmp_path, rng):
        path = tmp_path / "t.wav"
        samples = (rng.standard_normal(5000) * 20000).astype(np.int16)
        _write_wav(path, samples)
        a, ra = native.load_wav(str(path))
        b, rb = pywav.load_wav(str(path))
        assert ra == rb
        np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("bits", [8, 24, 32])
    def test_bit_exact_other_depths(self, tmp_path, rng, bits):
        """8/24/32-bit PCM: native == Python fallback, bit for bit (both
        divide in f32 like the reference's `s as f32 / max`)."""
        n = 3000
        if bits == 8:
            body = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        elif bits == 24:
            vals = rng.integers(-(2**23), 2**23, n).astype(np.int32)
            b = np.zeros((n, 3), np.uint8)
            b[:, 0] = vals & 0xFF
            b[:, 1] = (vals >> 8) & 0xFF
            b[:, 2] = (vals >> 16) & 0xFF
            body = b.tobytes()
        else:
            body = rng.integers(-(2**31), 2**31, n, dtype=np.int64).astype(
                np.int32).tobytes()
        fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * bits // 8,
                          bits // 8, bits)
        riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        riff += b"data" + struct.pack("<I", len(body)) + body
        path = tmp_path / f"d{bits}.wav"
        path.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)

        a, ra = native.load_wav(str(path))
        b_, rb = pywav.load_wav(str(path))
        assert ra == rb == 16000
        np.testing.assert_array_equal(a, b_)
        # /(2^(b-1)-1) normalization admits slightly >1 magnitudes (e.g.
        # -128/127); the reference does the same (main.rs:44-52)
        assert np.abs(a).max() <= 128.0 / 127.0 + 1e-6

    def test_reference_sample_bit_exact(self):
        a, ra = native.load_wav("/root/reference/audio.wav")
        b, rb = pywav.load_wav("/root/reference/audio.wav")
        assert ra == rb == 22050
        np.testing.assert_array_equal(a, b)

    def test_float32_wav(self, tmp_path):
        samples = np.array([0.0, 0.5, -0.25, 1.0], np.float32)
        body = samples.tobytes()
        fmt = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
        riff = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        riff += b"data" + struct.pack("<I", len(body)) + body
        path = tmp_path / "f.wav"
        path.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
        a, _ = native.load_wav(str(path))
        np.testing.assert_array_equal(a, samples)

    def test_rejects_stereo(self, tmp_path):
        path = tmp_path / "st.wav"
        with wave_mod.open(str(path), "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(np.zeros(64, np.int16).tobytes())
        with pytest.raises(pywav.WavFormatError):
            native.load_wav(str(path))

    def test_rejects_garbage(self, tmp_path):
        path = tmp_path / "bad.wav"
        path.write_bytes(b"not a wav at all")
        with pytest.raises(pywav.WavFormatError):
            native.load_wav(str(path))


class TestNativeWindow:
    def test_interior_window(self, rng):
        wave = rng.standard_normal(1000).astype(np.float32)
        out = native.window(wave, 100, 200)
        np.testing.assert_array_equal(out, wave[100:300])

    def test_tail_zero_pad(self, rng):
        wave = rng.standard_normal(100).astype(np.float32)
        out = native.window(wave, 50, 100)
        np.testing.assert_array_equal(out[:50], wave[50:])
        assert (out[50:] == 0).all()

    def test_fully_past_end(self, rng):
        wave = rng.standard_normal(10).astype(np.float32)
        out = native.window(wave, 100, 16)
        assert (out == 0).all()
