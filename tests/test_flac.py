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


# RFC 9639 Appendix D.1's complete example stream -- the one FLAC file in
# this offline environment NOT produced by this repo's encoder (it was
# produced by the spec authors' reference implementation). 1 inter-channel
# sample, 2 channels, 44.1 kHz, 16-bit; both subframes are VERBATIM with
# wasted bits (2 and 4), exercising the blocksize-at-end-of-header form
# (code 6) and the wasted-bits path on an external stream. The STREAMINFO
# MD5 is libFLAC's hash of the original input -- matching it is a
# cryptographic end-to-end check of the decode.
RFC9639_D1 = bytes.fromhex(
    "664c614380000022100010000000 0f00000f0ac442f000000001"  # hdr+streaminfo
    "3e84b41807dc690307586a3dad1a2e0f"  # MD5 of the 2 samples, int16 LE
    "fff86918 0000bf 0358fd03128b aa9a".replace(" ", "")  # the frame
)


class TestConformanceVector:
    """Decode a stream this repo's encoder did NOT write (VERDICT r4 item
    6: the round-trip tests share any spec misreading with flac_ref.py)."""

    def test_rfc9639_d1_samples(self, tmp_path):
        p = tmp_path / "rfc1.flac"
        p.write_bytes(RFC9639_D1)
        raw, info = native.load_flac_raw(str(p))
        # Hand-walk of the frame (documented in RFC 9639 D.1): subframe 1 =
        # verbatim, wasted=2, 14-bit value 6397 -> 25588; subframe 2 =
        # verbatim, wasted=4, 12-bit value 651 -> 10416.
        assert raw.tolist() == [[25588, 10416]]
        assert (info.sample_rate, info.n_channels,
                info.bits_per_sample, info.total_samples) == (44100, 2, 16, 1)
        # the embedded MD5 was computed by the spec authors' encoder
        assert native.verify_flac_md5(str(p)) is True
        out, rate = native.load_flac(str(p))
        assert rate == 44100
        np.testing.assert_allclose(out, [(25588 + 10416) // 2 / 32767.0])

    def test_md5_detects_corruption(self, tmp_path):
        # flip one sample bit inside the frame payload: MD5 must fail
        bad = bytearray(RFC9639_D1)
        bad[-6] ^= 0x40  # inside subframe 2's sample bits
        p = tmp_path / "bad.flac"
        p.write_bytes(bytes(bad))
        assert native.verify_flac_md5(str(p)) is False


class TestCodingModes:
    """Decoder paths the plain round-trips never reached: wasted bits,
    5-bit-parameter residual method, multi-partition residuals, escaped
    (raw) partitions -- plus the spec MD5 as an independent hash check on
    every stream (flac_ref now stamps it)."""

    @pytest.mark.parametrize("subframe,order", [
        ("verbatim", 0), ("fixed", 2), ("lpc", 2), ("constant", 0),
    ])
    def test_wasted_bits_round_trip(self, tmp_path, subframe, order):
        n = 4096
        sig = (np.full(n, 123, np.int64) if subframe == "constant"
               else _signal(n, seed=order, scale=4000)) << 3  # 3 zero low
        # bits; pre-shift cap keeps the shifted signal inside int16
        data = encode_flac(sig[None, :], subframe=subframe, order=order,
                           wasted=3)
        out, _ = _decode_bytes(data, tmp_path)
        np.testing.assert_allclose(out * 32767.0, sig, atol=0.5)

    @pytest.mark.parametrize("method,porder", [(1, 0), (0, 2), (1, 3)])
    def test_partitions_and_method1(self, tmp_path, method, porder):
        sig = _signal(4096, seed=7)
        data = encode_flac(sig[None, :], subframe="fixed", order=2,
                           method=method, partition_order=porder)
        out, _ = _decode_bytes(data, tmp_path)
        np.testing.assert_allclose(out * 32767.0, sig, atol=0.5)

    @pytest.mark.parametrize("method", [0, 1])
    def test_escaped_partitions(self, tmp_path, method):
        sig = _signal(4096, seed=9)
        data = encode_flac(sig[None, :], subframe="fixed", order=2,
                           method=method, partition_order=2, escape_raw=17)
        out, _ = _decode_bytes(data, tmp_path)
        np.testing.assert_allclose(out * 32767.0, sig, atol=0.5)

    @pytest.mark.parametrize("mode", ["independent", "left_side", "mid_side"])
    def test_md5_verify_stereo(self, tmp_path, mode):
        left, right = _signal(4000, seed=1), _signal(4000, seed=2)
        data = encode_flac(np.stack([left, right]), channel_mode=mode)
        p = tmp_path / "v.flac"
        p.write_bytes(data)
        raw, _ = native.load_flac_raw(str(p))
        np.testing.assert_array_equal(raw[:, 0], left)
        np.testing.assert_array_equal(raw[:, 1], right)
        assert native.verify_flac_md5(str(p)) is True


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
