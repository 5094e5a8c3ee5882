"""C++ FLAC decoder tests against the pure-Python encoder oracle
(flac_ref.py). LibriSpeech-typical streams are mono 16-bit fixed-predictor."""

import numpy as np
import pytest

from whisper_tpu.io import native
from flac_ref import encode_flac

pytestmark = pytest.mark.skipif(
    not native.flac_available(), reason="native FLAC decoder not built"
)


def _decode_bytes(data: bytes, tmp_path, name="t.flac"):
    p = tmp_path / name
    p.write_bytes(data)
    return native.load_flac(str(p))


def _signal(n, seed=0, scale=8000):
    rng = np.random.default_rng(seed)
    # band-limited-ish signal: random walk clipped to int16
    x = np.cumsum(rng.integers(-300, 300, n))
    return np.clip(x, -scale, scale).astype(np.int64)


class TestMono:
    @pytest.mark.parametrize("subframe,order", [
        ("constant", 0), ("verbatim", 0), ("fixed", 0), ("fixed", 1),
        ("fixed", 2), ("fixed", 3), ("fixed", 4), ("lpc", 1), ("lpc", 2),
    ])
    def test_round_trip(self, tmp_path, subframe, order):
        n = 5000
        if subframe == "constant":
            sig = np.full(n, 123, np.int64)
        else:
            sig = _signal(n, seed=order)
        data = encode_flac(sig[None, :], subframe=subframe, order=order)
        out, rate = _decode_bytes(data, tmp_path)
        assert rate == 16000
        assert len(out) == n
        np.testing.assert_allclose(out * 32767.0, sig, atol=0.5)

    def test_multi_frame(self, tmp_path):
        sig = _signal(10000, seed=5)
        data = encode_flac(sig[None, :], block_size=2048)
        out, _ = _decode_bytes(data, tmp_path)
        assert len(out) == 10000
        np.testing.assert_allclose(out * 32767.0, sig, atol=0.5)

    def test_probe(self, tmp_path):
        sig = _signal(3000)
        p = tmp_path / "p.flac"
        p.write_bytes(encode_flac(sig[None, :], sample_rate=22050))
        out, rate = native.load_flac(str(p))
        assert rate == 22050 and len(out) == 3000


class TestStereo:
    @pytest.mark.parametrize("mode", ["independent", "left_side", "mid_side"])
    def test_downmix(self, tmp_path, mode):
        left = _signal(4000, seed=1)
        right = _signal(4000, seed=2)
        data = encode_flac(np.stack([left, right]), channel_mode=mode)
        out, _ = _decode_bytes(data, tmp_path)
        expected = (left + right) // 2  # decoder's integer downmix
        np.testing.assert_allclose(out * 32767.0, expected, atol=1.0)


class TestErrors:
    def test_not_flac(self, tmp_path):
        from whisper_tpu.io.wav import WavFormatError

        p = tmp_path / "bad.flac"
        p.write_bytes(b"definitely not flac data")
        with pytest.raises(WavFormatError):
            native.load_flac(str(p))

    def test_truncated(self, tmp_path):
        from whisper_tpu.io.wav import WavFormatError

        sig = _signal(4000)
        data = encode_flac(sig[None, :])
        p = tmp_path / "trunc.flac"
        p.write_bytes(data[: len(data) // 2])
        with pytest.raises(WavFormatError):
            native.load_flac(str(p))

    def test_load_audio_dispatch(self, tmp_path):
        sig = _signal(2000)
        p = tmp_path / "x.flac"
        p.write_bytes(encode_flac(sig[None, :]))
        out, rate = native.load_audio(str(p))
        assert len(out) == 2000
        out2, rate2 = native.load_audio("/root/reference/audio.wav")
        assert rate2 == 22050
