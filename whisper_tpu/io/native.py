"""ctypes bindings for the C++ native data-loader (native/whisper_io.cpp).

Loads `native/libwhisper_io.so` if present (build with `make -C native`);
every entry point has the pure-Python implementation in `io.wav` as fallback,
and the test suite asserts bit-identical outputs between the two.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

from . import wav as _pywav

def _lib_path() -> Optional[str]:
    """Search order: WHISPER_TPU_NATIVE_LIB env var, the installed package's
    `whisper_tpu/_native/` (placed by setup.py), then the source tree's
    `native/` (built with `make -C native`)."""
    env = os.environ.get("WHISPER_TPU_NATIVE_LIB")
    if env:
        return env
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cand in (
        os.path.join(pkg_dir, "_native", "libwhisper_io.so"),
        os.path.join(os.path.dirname(pkg_dir), "native", "libwhisper_io.so"),
    ):
        if os.path.exists(cand):
            return cand
    return None


_LIB_PATH = _lib_path()

_ERRORS = {
    -1: "not a RIFF/WAVE file",
    -2: "missing fmt/data chunk",
    -3: "The audio must be single-channel.",
    -4: "unsupported WAV format",
    -5: "output buffer too small",
}


class _WioInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_uint32),
        ("n_samples", ctypes.c_uint32),
        ("bits", ctypes.c_uint16),
        ("format", ctypes.c_uint16),
    ]


def _load_lib() -> Optional[ctypes.CDLL]:
    if _LIB_PATH is None or not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.wio_probe.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_WioInfo)
    ]
    lib.wio_probe.restype = ctypes.c_int
    lib.wio_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.wio_decode.restype = ctypes.c_int
    lib.wio_window.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
    ]
    lib.wio_window.restype = ctypes.c_int
    return lib


_LIB = _load_lib()


def available() -> bool:
    return _LIB is not None


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Native WAV decode; falls back to the pure-Python parser."""
    if _LIB is None:
        return _pywav.load_wav(path)
    with open(path, "rb") as f:
        data = f.read()
    info = _WioInfo()
    rc = _LIB.wio_probe(data, len(data), ctypes.byref(info))
    if rc != 0:
        raise _pywav.WavFormatError(f"{path}: {_ERRORS.get(rc, rc)}")
    out = np.empty(info.n_samples, np.float32)
    rc = _LIB.wio_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
    )
    if rc != 0:
        raise _pywav.WavFormatError(f"{path}: {_ERRORS.get(rc, rc)}")
    return out, int(info.sample_rate)


def window(wave: np.ndarray, start: int, count: int) -> np.ndarray:
    """Zero-padded window slice [start, start+count)."""
    wave = np.ascontiguousarray(wave, np.float32)
    out = np.empty(count, np.float32)
    if _LIB is None:
        end = min(start + count, len(wave))
        n = max(end - start, 0)
        out[:n] = wave[start : start + n]
        out[n:] = 0.0
        return out
    rc = _LIB.wio_window(
        wave.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wave),
        start, count,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError(f"wio_window failed: {rc}")
    return out


# ----------------------------------------------------------------------------
# FLAC (LibriSpeech's format; no libFLAC/ffmpeg in this environment --
# decoded by native/flac_decoder.cpp)
# ----------------------------------------------------------------------------


class _FlacInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_uint32),
        ("n_channels", ctypes.c_uint32),
        ("bits_per_sample", ctypes.c_uint32),
        ("total_samples", ctypes.c_uint64),
    ]


def _bind_flac(lib: ctypes.CDLL) -> None:
    lib.flac_probe.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.POINTER(_FlacInfo)
    ]
    lib.flac_probe.restype = ctypes.c_int
    lib.flac_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.flac_decode.restype = ctypes.c_int64
    lib.flac_decode_raw.argtypes = [
        ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.flac_decode_raw.restype = ctypes.c_int64


if _LIB is not None:
    try:
        _bind_flac(_LIB)
    except AttributeError:  # old .so without the FLAC symbols
        pass


def flac_available() -> bool:
    return _LIB is not None and hasattr(_LIB, "flac_decode")


def load_flac(path: str) -> Tuple[np.ndarray, int]:
    """Decode a FLAC file -> (float32 samples in [-1, 1], sample_rate).

    Stereo is averaged to mono; normalization matches the WAV loader
    (/(2^(bits-1) - 1), reference main.rs:44-52 semantics).
    """
    if not flac_available():
        raise _pywav.WavFormatError(
            "FLAC support requires native/libwhisper_io.so (make -C native)"
        )
    with open(path, "rb") as f:
        data = f.read()
    info = _FlacInfo()
    rc = _LIB.flac_probe(data, len(data), ctypes.byref(info))
    if rc != 0:
        raise _pywav.WavFormatError(f"{path}: FLAC probe failed ({rc})")
    cap = int(info.total_samples) if info.total_samples else len(data) * 8
    while True:
        out = np.empty(cap, np.int32)
        n = _LIB.flac_decode(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), out.size,
        )
        if n != -5:  # FLAC_BUFFER_SMALL: only when total_samples is unknown
            break
        # highly compressible streams (constant/silence frames) can exceed
        # 8 samples per encoded byte; grow geometrically and retry
        cap *= 4
    if n < 0:
        raise _pywav.WavFormatError(f"{path}: FLAC decode failed ({n})")
    denom = float(2 ** (info.bits_per_sample - 1) - 1)
    return (out[:n].astype(np.float32) / denom), int(info.sample_rate)


def load_flac_raw(path: str) -> Tuple[np.ndarray, "_FlacInfo"]:
    """Decode a FLAC file -> ((n, channels) int32 raw samples, info).

    No downmix, no normalization: the exact per-channel integers the
    encoder hashed into the STREAMINFO MD5 (RFC 9639 §8.2) -- used by
    `verify_flac_md5` and by tests that pin conformance-vector sample
    values."""
    if not flac_available() or not hasattr(_LIB, "flac_decode_raw"):
        raise _pywav.WavFormatError(
            "FLAC support requires native/libwhisper_io.so (make -C native)"
        )
    with open(path, "rb") as f:
        data = f.read()
    info = _FlacInfo()
    rc = _LIB.flac_probe(data, len(data), ctypes.byref(info))
    if rc != 0:
        raise _pywav.WavFormatError(f"{path}: FLAC probe failed ({rc})")
    nch = max(int(info.n_channels), 1)
    cap = (int(info.total_samples) if info.total_samples
           else len(data) * 8) * nch
    while True:
        out = np.empty(cap, np.int32)
        n = _LIB.flac_decode_raw(
            data, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), out.size,
        )
        if n != -5:  # FLAC_BUFFER_SMALL
            break
        cap *= 4
    if n < 0:
        raise _pywav.WavFormatError(f"{path}: FLAC decode failed ({n})")
    return out[: n * nch].reshape(n, nch), info


def verify_flac_md5(path: str) -> Optional[bool]:
    """Check the decoded samples against the encoder's STREAMINFO MD5.

    Returns True/False, or None when the stream carries no MD5 (all-zero
    field). The hash covers the raw interleaved little-endian samples at
    the stream's bit width (RFC 9639 §8.2) -- a cryptographic end-to-end
    check that the decode reproduced the encoder's input bit-for-bit."""
    import hashlib

    samples, info = load_flac_raw(path)
    with open(path, "rb") as f:
        f.seek(4)
        # STREAMINFO is the mandatory first block; MD5 is its last 16 bytes
        hdr = f.read(4)
        size = int.from_bytes(hdr[1:4], "big")
        block = f.read(size)
    embedded = block[size - 16: size]
    if embedded == b"\x00" * 16:
        return None
    bits = int(info.bits_per_sample)
    nbytes = (bits + 7) // 8
    flat = samples.reshape(-1)
    if nbytes in (1, 2, 4):
        raw = flat.astype(f"<i{nbytes}").tobytes()
    else:  # 24-bit: low 3 bytes of the little-endian i32
        b4 = flat.astype("<i4").view(np.uint8).reshape(-1, 4)
        raw = np.ascontiguousarray(b4[:, :3]).tobytes()
    return hashlib.md5(raw).hexdigest() == embedded.hex()


def load_audio(path: str) -> Tuple[np.ndarray, int]:
    """Dispatch by extension: .flac via the native decoder, else WAV."""
    if path.lower().endswith(".flac"):
        return load_flac(path)
    return load_wav(path)
