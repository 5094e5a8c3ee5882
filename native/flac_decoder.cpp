// Minimal FLAC decoder for the whisper_tpu native data-loader.
//
// Why: the BASELINE accuracy metric is LibriSpeech WER, and LibriSpeech ships
// FLAC; this image has no libFLAC/ffmpeg/soundfile. This implements the FLAC
// subset those files use (and more): constant / verbatim / fixed / LPC
// subframes, Rice (method 0 and 4-bit-escape method 1) residual coding,
// independent + left-side/right-side/mid-side stereo, 8/16/24-bit samples.
// CRCs are parsed but not validated (we are a reader, not a verifier).
//
// C API (ctypes-friendly, mirrors whisper_io.cpp):
//   flac_probe(data, len, info*)            -> 0 or negative error
//   flac_decode(data, len, out, cap)        -> n_samples or negative error
// Output samples are int32 (raw FLAC values; divide by 2^(bits-1)-1 for the
// reference's float normalization).

#include <cstdint>
#include <cstring>

extern "C" {

enum flac_error {
  FLAC_OK = 0,
  FLAC_BAD_MAGIC = -1,
  FLAC_NO_STREAMINFO = -2,
  FLAC_BAD_FRAME = -3,
  FLAC_UNSUPPORTED = -4,
  FLAC_BUFFER_SMALL = -5,
  FLAC_TRUNCATED = -6,
  FLAC_NOT_MONO = -7,  // decode() flattens channels; probe reports them
};

struct flac_info {
  uint32_t sample_rate;
  uint32_t n_channels;
  uint32_t bits_per_sample;
  uint64_t total_samples;  // per channel; 0 = unknown
};

namespace {

struct BitReader {
  const uint8_t* data;
  int64_t len;
  int64_t byte = 0;
  int bit = 0;  // bits consumed in current byte (0..7)
  bool overrun = false;

  uint32_t read_bit() {
    if (byte >= len) { overrun = true; return 0; }
    uint32_t v = (data[byte] >> (7 - bit)) & 1u;
    if (++bit == 8) { bit = 0; ++byte; }
    return v;
  }

  uint64_t read_bits(int n) {  // n <= 57
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n == 0) return 0;
    if (v & (1ull << (n - 1))) return (int64_t)v - (1ll << n);
    return (int64_t)v;
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (!overrun && read_bit() == 0) ++q;
    return q;
  }

  void align() { if (bit) { bit = 0; ++byte; } }
};

// UTF-8-style coded number (frame header sample/frame number)
uint64_t read_utf8(BitReader& br) {
  uint64_t b0 = br.read_bits(8);
  if (!(b0 & 0x80)) return b0;
  int n = 0;
  for (uint64_t m = 0x40; b0 & m; m >>= 1) ++n;
  uint64_t v = b0 & (0x3Full >> n);
  for (int i = 0; i < n; ++i) v = (v << 6) | (br.read_bits(8) & 0x3F);
  return v;
}

const int kFixedOrderMax = 4;

int parse_streaminfo(const uint8_t* data, int64_t len, flac_info* info,
                     int64_t* frames_start) {
  if (len < 8 || memcmp(data, "fLaC", 4) != 0) return FLAC_BAD_MAGIC;
  int64_t pos = 4;
  bool have_si = false;
  while (pos + 4 <= len) {
    uint8_t hdr = data[pos];
    bool last = hdr & 0x80;
    uint8_t type = hdr & 0x7F;
    uint32_t size = ((uint32_t)data[pos + 1] << 16) |
                    ((uint32_t)data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (type == 0 && size >= 34 && pos + 34 <= len) {
      const uint8_t* s = data + pos;
      info->sample_rate =
          ((uint32_t)s[10] << 12) | ((uint32_t)s[11] << 4) | (s[12] >> 4);
      info->n_channels = ((s[12] >> 1) & 0x7) + 1;
      info->bits_per_sample = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
      info->total_samples =
          ((uint64_t)(s[13] & 0x0F) << 32) | ((uint64_t)s[14] << 24) |
          ((uint64_t)s[15] << 16) | ((uint64_t)s[16] << 8) | s[17];
      have_si = true;
    }
    pos += size;
    if (last) break;
  }
  if (!have_si) return FLAC_NO_STREAMINFO;
  *frames_start = pos;
  return FLAC_OK;
}

// Decode one subframe into out[ch_stride indexing handled by caller].
int decode_subframe(BitReader& br, int block_size, int bps, int64_t* out) {
  if (br.read_bit() != 0) return FLAC_BAD_FRAME;  // padding bit
  uint32_t type = (uint32_t)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) wasted = 1 + (int)br.read_unary();
  int ebps = bps - wasted;

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(ebps);
    for (int i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; ++i) out[i] = br.read_signed(ebps);
  } else if ((type >= 8 && type <= 12) || type >= 32) {
    int order;
    int64_t coefs[33];
    int shift = 0;
    bool lpc = type >= 32;
    if (lpc) {
      order = (int)(type - 31);
    } else {
      order = (int)(type - 8);
      if (order > kFixedOrderMax) return FLAC_BAD_FRAME;
    }
    if (order > block_size) return FLAC_BAD_FRAME;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(ebps);
    if (lpc) {
      int precision = (int)br.read_bits(4) + 1;
      if (precision == 16) return FLAC_BAD_FRAME;  // 0b1111 invalid
      shift = (int)br.read_signed(5);
      if (shift < 0) return FLAC_BAD_FRAME;
      for (int i = 0; i < order; ++i) coefs[i] = br.read_signed(precision);
    }

    // residual
    uint32_t method = (uint32_t)br.read_bits(2);
    if (method > 1) return FLAC_UNSUPPORTED;
    int plen = method == 0 ? 4 : 5;
    uint32_t esc = method == 0 ? 0xF : 0x1F;
    int porder = (int)br.read_bits(4);
    int nparts = 1 << porder;
    if (block_size % nparts != 0) return FLAC_BAD_FRAME;
    int idx = order;
    for (int p = 0; p < nparts; ++p) {
      int count = (block_size >> porder) - (p == 0 ? order : 0);
      if (count < 0) return FLAC_BAD_FRAME;
      uint32_t rice = (uint32_t)br.read_bits(plen);
      if (rice == esc) {
        int raw = (int)br.read_bits(5);
        for (int i = 0; i < count; ++i) out[idx++] = br.read_signed(raw);
      } else {
        for (int i = 0; i < count; ++i) {
          uint64_t q = br.read_unary();
          uint64_t u = (q << rice) | br.read_bits((int)rice);
          out[idx++] = (u & 1) ? -((int64_t)(u >> 1)) - 1 : (int64_t)(u >> 1);
        }
      }
      if (br.overrun) return FLAC_TRUNCATED;
    }

    // prediction
    if (lpc) {
      for (int i = order; i < block_size; ++i) {
        int64_t acc = 0;
        for (int j = 0; j < order; ++j) acc += coefs[j] * out[i - 1 - j];
        out[i] += acc >> shift;
      }
    } else {
      switch (order) {
        case 0: break;
        case 1:
          for (int i = 1; i < block_size; ++i) out[i] += out[i - 1];
          break;
        case 2:
          for (int i = 2; i < block_size; ++i)
            out[i] += 2 * out[i - 1] - out[i - 2];
          break;
        case 3:
          for (int i = 3; i < block_size; ++i)
            out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
          break;
        case 4:
          for (int i = 4; i < block_size; ++i)
            out[i] += 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] -
                      out[i - 4];
          break;
      }
    }
  } else {
    return FLAC_UNSUPPORTED;  // reserved types
  }

  if (wasted) {
    for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
  }
  return FLAC_OK;
}

const uint32_t kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, 0, 0,
                                  256, 512, 1024, 2048, 4096, 8192, 16384, 32768};

}  // namespace

int flac_probe(const uint8_t* data, int64_t len, flac_info* info) {
  int64_t frames_start;
  return parse_streaminfo(data, len, info, &frames_start);
}

// Decode the whole stream. `raw` writes every channel interleaved
// (s0c0, s0c1, s1c0, ...) and returns the PER-CHANNEL sample count --
// callers use it to verify the decode against the STREAMINFO MD5 (computed
// by the encoder over exactly this interleaved order, RFC 9639 §8.2).
// !raw averages channels to mono like a resampling front door would do
// (LibriSpeech is mono anyway). Returns sample count or a negative error.
static int64_t decode_impl(const uint8_t* data, int64_t len, int32_t* out,
                           int64_t cap, bool raw) {
  flac_info info;
  int64_t pos;
  int rc = parse_streaminfo(data, len, &info, &pos);
  if (rc != FLAC_OK) return rc;
  int nch = (int)info.n_channels;
  if (nch < 1 || nch > 2) return FLAC_UNSUPPORTED;

  static thread_local int64_t* chan[2] = {nullptr, nullptr};
  static thread_local int64_t chan_cap = 0;

  int64_t written = 0;
  BitReader br{data + pos, len - pos};
  while (true) {
    // skip to next frame sync (frames are byte-aligned)
    br.align();
    if (br.byte >= br.len) break;
    uint64_t sync = br.read_bits(14);
    if (br.overrun) break;
    if (sync != 0x3FFE) return FLAC_BAD_FRAME;
    br.read_bit();  // reserved
    br.read_bit();  // blocking strategy
    uint32_t bs_code = (uint32_t)br.read_bits(4);
    uint32_t sr_code = (uint32_t)br.read_bits(4);
    uint32_t ch_code = (uint32_t)br.read_bits(4);
    uint32_t ss_code = (uint32_t)br.read_bits(3);
    br.read_bit();  // reserved
    read_utf8(br);  // frame/sample number

    int block_size;
    if (bs_code == 6) block_size = (int)br.read_bits(8) + 1;
    else if (bs_code == 7) block_size = (int)br.read_bits(16) + 1;
    else if (kBlockSizes[bs_code]) block_size = (int)kBlockSizes[bs_code];
    else return FLAC_BAD_FRAME;

    if (sr_code == 12) br.read_bits(8);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

    int bps = (int)info.bits_per_sample;
    switch (ss_code) {  // frame can override STREAMINFO bps
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: break;
    }
    br.read_bits(8);  // CRC-8 (unvalidated)

    if (ch_code > 10) return FLAC_UNSUPPORTED;  // reserved assignments 11-15
    int frame_ch = (ch_code < 8) ? (int)ch_code + 1 : 2;
    if (frame_ch != nch) return FLAC_BAD_FRAME;

    if (block_size > chan_cap) {
      delete[] chan[0];
      delete[] chan[1];
      chan[0] = new int64_t[block_size];
      chan[1] = new int64_t[block_size];
      chan_cap = block_size;
    }

    for (int c = 0; c < frame_ch; ++c) {
      int sub_bps = bps;
      // side channels carry one extra bit
      if (ch_code == 8 && c == 1) sub_bps += 1;       // left/side
      else if (ch_code == 9 && c == 0) sub_bps += 1;  // side/right
      else if (ch_code == 10 && c == 1) sub_bps += 1; // mid/side
      rc = decode_subframe(br, block_size, sub_bps, chan[c]);
      if (rc != FLAC_OK) return rc;
    }
    br.align();
    br.read_bits(16);  // CRC-16 (unvalidated)
    if (br.overrun) return FLAC_TRUNCATED;

    // undo stereo decorrelation
    if (ch_code == 8) {  // left/side: right = left - side
      for (int i = 0; i < block_size; ++i) chan[1][i] = chan[0][i] - chan[1][i];
    } else if (ch_code == 9) {  // side/right: left = right + side
      for (int i = 0; i < block_size; ++i) chan[0][i] += chan[1][i];
    } else if (ch_code == 10) {  // mid/side
      for (int i = 0; i < block_size; ++i) {
        int64_t side = chan[1][i];
        int64_t mid = (chan[0][i] << 1) | (side & 1);
        chan[0][i] = (mid + side) >> 1;
        chan[1][i] = (mid - side) >> 1;
      }
    }

    if ((written + block_size) * (raw ? nch : 1) > cap)
      return FLAC_BUFFER_SMALL;
    if (raw) {
      for (int i = 0; i < block_size; ++i)
        for (int c = 0; c < nch; ++c)
          out[(written + i) * nch + c] = (int32_t)chan[c][i];
    } else if (nch == 1) {
      for (int i = 0; i < block_size; ++i) out[written + i] = (int32_t)chan[0][i];
    } else {
      for (int i = 0; i < block_size; ++i)
        out[written + i] = (int32_t)((chan[0][i] + chan[1][i]) / 2);
    }
    written += block_size;

    if (info.total_samples && (uint64_t)written >= info.total_samples) break;
  }
  return written;
}

int64_t flac_decode(const uint8_t* data, int64_t len, int32_t* out,
                    int64_t cap) {
  return decode_impl(data, len, out, cap, false);
}

int64_t flac_decode_raw(const uint8_t* data, int64_t len, int32_t* out,
                        int64_t cap) {
  return decode_impl(data, len, out, cap, true);
}

}  // extern "C"
