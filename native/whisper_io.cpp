// Native data-loader for whisper_tpu: fast WAV decode + window slicing.
//
// Role: the host-side native substrate (SURVEY.md C27 discussion). The
// reference's runtime-side native code is its Rust/`hound` WAV loader
// (src/bin/transcribe/main.rs:31-55) and the `npy` parser; the TPU build's
// compute-side native layer is XLA + Pallas, and this file is the IO-side
// equivalent: a zero-copy RIFF parser with the reference's exact
// normalization semantics (ints divided by 2^(bits-1) - 1), exposed to
// Python via ctypes (whisper_tpu/io/native.py) with the pure-Python
// implementation as fallback and semantics oracle.
//
// Build: `make -C native` -> native/libwhisper_io.so
//
// API (C, ctypes-friendly): all functions return 0 on success or a negative
// error code from wio_error below.

#include <cstdint>
#include <cstring>
#include <cstdio>

extern "C" {

enum wio_error {
  WIO_OK = 0,
  WIO_BAD_RIFF = -1,
  WIO_MISSING_CHUNK = -2,
  WIO_NOT_MONO = -3,
  WIO_BAD_FORMAT = -4,
  WIO_BUFFER_TOO_SMALL = -5,
};

struct wio_info {
  uint32_t sample_rate;
  uint32_t n_samples;
  uint16_t bits;
  uint16_t format;  // 1 = PCM int, 3 = IEEE float
};

static int parse_chunks(const uint8_t* data, int64_t len, wio_info* info,
                        const uint8_t** body_out, int64_t* body_len_out) {
  if (len < 12 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return WIO_BAD_RIFF;

  const uint8_t* body = nullptr;
  int64_t body_len = 0;
  bool have_fmt = false;
  uint16_t audio_format = 0, n_channels = 0, bits = 0;
  uint32_t sample_rate = 0;

  int64_t pos = 12;
  while (pos + 8 <= len) {
    uint32_t chunk_size;
    memcpy(&chunk_size, data + pos + 4, 4);
    const uint8_t* chunk = data + pos + 8;
    int64_t avail = len - pos - 8;
    int64_t csize = chunk_size < avail ? chunk_size : avail;

    if (memcmp(data + pos, "fmt ", 4) == 0 && csize >= 16) {
      memcpy(&audio_format, chunk + 0, 2);
      memcpy(&n_channels, chunk + 2, 2);
      memcpy(&sample_rate, chunk + 4, 4);
      memcpy(&bits, chunk + 14, 2);
      if (audio_format == 0xFFFE && csize >= 26) {  // WAVE_FORMAT_EXTENSIBLE
        memcpy(&audio_format, chunk + 24, 2);
      }
      have_fmt = true;
    } else if (memcmp(data + pos, "data", 4) == 0) {
      body = chunk;
      body_len = csize;
    }
    pos += 8 + chunk_size + (chunk_size & 1);  // chunks are word-aligned
  }

  if (!have_fmt || body == nullptr) return WIO_MISSING_CHUNK;
  if (n_channels != 1) return WIO_NOT_MONO;

  uint32_t bytes_per = bits / 8;
  if (bytes_per == 0) return WIO_BAD_FORMAT;
  if (audio_format == 3) {
    if (bits != 32) return WIO_BAD_FORMAT;
  } else if (audio_format == 1) {
    if (bits != 8 && bits != 16 && bits != 24 && bits != 32)
      return WIO_BAD_FORMAT;
  } else {
    return WIO_BAD_FORMAT;
  }

  info->sample_rate = sample_rate;
  info->n_samples = (uint32_t)(body_len / bytes_per);
  info->bits = bits;
  info->format = audio_format;
  *body_out = body;
  *body_len_out = body_len;
  return WIO_OK;
}

// Probe a WAV buffer: fill info with rate/length/format. No allocation.
int wio_probe(const uint8_t* data, int64_t len, wio_info* info) {
  const uint8_t* body;
  int64_t body_len;
  return parse_chunks(data, len, info, &body, &body_len);
}

// Decode a WAV buffer into out[0..n_samples) as float32 in [-1, 1].
// Normalization matches the reference: integer samples are divided by
// 2^(bits-1) - 1 (NOT 2^(bits-1)) -- src/bin/transcribe/main.rs:44,50.
int wio_decode(const uint8_t* data, int64_t len, float* out, int64_t out_cap) {
  wio_info info;
  const uint8_t* body;
  int64_t body_len;
  int rc = parse_chunks(data, len, &info, &body, &body_len);
  if (rc != WIO_OK) return rc;
  if ((int64_t)info.n_samples > out_cap) return WIO_BUFFER_TOO_SMALL;

  const int64_t n = info.n_samples;
  if (info.format == 3) {  // float32 passthrough
    memcpy(out, body, n * 4);
    return WIO_OK;
  }
  switch (info.bits) {
    case 16: {
      // true division (not reciprocal multiply): bit-exact with the
      // reference's `s as f32 / 32767.0` and the Python fallback
      const int16_t* s = (const int16_t*)body;
      for (int64_t i = 0; i < n; ++i) out[i] = (float)s[i] / 32767.0f;
      break;
    }
    case 32: {
      // f32 division like the 16-bit case: the divisor 2147483647 rounds to
      // 2^31 in float32, matching the reference's `s as f32 / max` f32
      // semantics and the Python fallback bit for bit.
      const int32_t* s = (const int32_t*)body;
      for (int64_t i = 0; i < n; ++i) out[i] = (float)s[i] / 2147483647.0f;
      break;
    }
    case 24: {
      for (int64_t i = 0; i < n; ++i) {
        const uint8_t* p = body + 3 * i;
        int32_t v = (int32_t)(p[0] | (p[1] << 8) | (p[2] << 16));
        v = (v << 8) >> 8;  // sign-extend 24 -> 32
        out[i] = (float)v / 8388607.0f;
      }
      break;
    }
    case 8: {  // unsigned 8-bit PCM, offset binary
      for (int64_t i = 0; i < n; ++i) out[i] = (float)((int)body[i] - 128) / 127.0f;
      break;
    }
    default:
      return WIO_BAD_FORMAT;
  }
  return WIO_OK;
}

// Copy window [start, start+count) of a waveform into out, zero-padding past
// the end -- the host-side window slicer for the long-form pipeline
// (src/transcribe.rs:125-129 semantics, plus explicit pad length control).
int wio_window(const float* wave, int64_t n, int64_t start, int64_t count,
               float* out) {
  if (start < 0 || count < 0) return WIO_BAD_FORMAT;
  int64_t avail = n - start;
  if (avail < 0) avail = 0;
  int64_t copy = avail < count ? avail : count;
  memcpy(out, wave + start, copy * sizeof(float));
  if (copy < count) memset(out + copy, 0, (count - copy) * sizeof(float));
  return WIO_OK;
}

}  // extern "C"
