// carta1_tpu native host tier: batched ATRAC1 sound-unit (de)serialization
// and PCM conversion.
//
// Bit layout parity: reference codec/io/serialization.js:41-176 and
// bitstream.js (MSB-first within bytes, two's-complement coefficients),
// PCM conversion parity: processor.js:361-371 (clamp, asymmetric
// 32768/32767 scaling, truncation toward zero).
//
// The TPU engine packs/unpacks in-graph (ops/bitpack.py); this native tier
// serves the host paths: file IO, the exact engine, corpus drivers, and
// environments without a JAX device.  It is OpenMP-parallel over frames.
//
// Build: g++ -O3 -march=native -shared -fPIC -fopenmp \
//            carta1_native.cpp -o libcarta1_native.so

#include <cstdint>
#include <cstring>
#include <cmath>

namespace {

constexpr int kSoundUnit = 212;
constexpr int kNumBfus = 52;
constexpr int kMaxBfuSize = 20;
constexpr int kHeaderBits = 16;

constexpr int32_t kSpecsPerBfu[kNumBfus] = {
    8, 8, 8, 8, 4, 4, 4, 4, 8, 8, 8, 8, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
    7, 7, 7, 7, 9, 9, 9, 9, 10, 10, 10, 10, 12, 12, 12, 12, 12, 12, 12, 12,
    20, 20, 20, 20, 20, 20, 20, 20};

constexpr int32_t kBfuAmounts[8] = {20, 28, 32, 36, 40, 44, 48, 52};

inline int32_t word_length_bits(int32_t wl) { return wl > 0 ? wl + 1 : 0; }

// MSB-first bit writer (bitstream.js:15-39 semantics, byte at a time).
struct BitWriter {
  uint8_t* buf;
  int pos = 0;  // bit position
  void put(uint32_t value, int bits) {
    if (bits == 0) return;
    value &= (bits >= 32) ? 0xFFFFFFFFu : ((1u << bits) - 1u);
    int remaining = bits;
    // bits beyond the sound unit are dropped (bitstream.js:24 stops at the
    // buffer end); guards malformed frames from overrunning the next unit
    while (remaining > 0 && pos < kSoundUnit * 8) {
      int byte_idx = pos >> 3;
      int bit_off = pos & 7;
      int avail = 8 - bit_off;
      int take = remaining < avail ? remaining : avail;
      uint32_t chunk = (value >> (remaining - take)) & ((1u << take) - 1u);
      buf[byte_idx] |= static_cast<uint8_t>(chunk << (avail - take));
      pos += take;
      remaining -= take;
    }
  }
};

struct BitReader {
  const uint8_t* buf;
  int limit_bits;
  int pos = 0;
  uint32_t get(int bits) {
    uint32_t value = 0;
    int remaining = bits;
    while (remaining > 0 && pos < limit_bits) {
      int byte_idx = pos >> 3;
      int bit_off = pos & 7;
      int avail = 8 - bit_off;
      int take = remaining < avail ? remaining : avail;
      uint32_t chunk = (buf[byte_idx] >> (avail - take)) & ((1u << take) - 1u);
      value = (value << take) | chunk;
      pos += take;
      remaining -= take;
    }
    return value;
  }
  int32_t get_signed(int bits) {
    uint32_t v = get(bits);
    uint32_t sign = 1u << (bits - 1);
    return v >= sign ? static_cast<int32_t>(v) - (1 << bits)
                     : static_cast<int32_t>(v);
  }
};

}  // namespace

extern "C" {

// fd arrays: n_bfu[F], block_modes[F*3], sf[F*52], wl[F*52],
// quant[F*52*20]; out: units[F*212] (zero-initialized by callee).
void carta1_pack_frames(const int32_t* n_bfu, const int32_t* block_modes,
                        const int32_t* sf, const int32_t* wl,
                        const int32_t* quant, int64_t nframes, uint8_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t f = 0; f < nframes; ++f) {
    uint8_t* unit = out + f * kSoundUnit;
    std::memset(unit, 0, kSoundUnit);
    const int32_t* bm = block_modes + f * 3;
    int nb = n_bfu[f];
    int bfu_idx = 7;
    for (int i = 0; i < 8; ++i) {
      if (kBfuAmounts[i] == nb) { bfu_idx = i; break; }
    }
    BitWriter w{unit};
    uint32_t header = ((2 - bm[0]) << 14) | ((2 - bm[1]) << 12) |
                      ((3 - bm[2]) << 10) | (bfu_idx << 5);
    w.put(header, 16);
    const int32_t* fwl = wl + f * kNumBfus;
    const int32_t* fsf = sf + f * kNumBfus;
    for (int i = 0; i < nb; ++i) w.put(static_cast<uint32_t>(fwl[i]), 4);
    for (int i = 0; i < nb; ++i) w.put(static_cast<uint32_t>(fsf[i]), 6);
    const int32_t* fq = quant + f * kNumBfus * kMaxBfuSize;
    for (int i = 0; i < nb; ++i) {
      int bits = word_length_bits(fwl[i]);
      if (bits <= 0) continue;
      for (int k = 0; k < kSpecsPerBfu[i]; ++k) {
        int32_t v = fq[i * kMaxBfuSize + k];
        uint32_t stored = v < 0 ? static_cast<uint32_t>(v + (1 << bits))
                                : static_cast<uint32_t>(v);
        w.put(stored, bits);
      }
    }
  }
}

void carta1_unpack_frames(const uint8_t* units, int64_t nframes,
                          int32_t* n_bfu, int32_t* block_modes, int32_t* sf,
                          int32_t* wl, int32_t* quant) {
#pragma omp parallel for schedule(static)
  for (int64_t f = 0; f < nframes; ++f) {
    const uint8_t* unit = units + f * kSoundUnit;
    BitReader r{unit, kSoundUnit * 8};
    uint32_t header = r.get(16);
    int32_t* bm = block_modes + f * 3;
    bm[0] = 2 - ((header >> 14) & 3);
    bm[1] = 2 - ((header >> 12) & 3);
    bm[2] = 3 - ((header >> 10) & 3);
    int nb = kBfuAmounts[(header >> 5) & 7];
    n_bfu[f] = nb;
    int32_t* fwl = wl + f * kNumBfus;
    int32_t* fsf = sf + f * kNumBfus;
    int32_t* fq = quant + f * kNumBfus * kMaxBfuSize;
    std::memset(fwl, 0, kNumBfus * sizeof(int32_t));
    std::memset(fsf, 0, kNumBfus * sizeof(int32_t));
    std::memset(fq, 0, kNumBfus * kMaxBfuSize * sizeof(int32_t));
    for (int i = 0; i < nb; ++i) fwl[i] = static_cast<int32_t>(r.get(4));
    for (int i = 0; i < nb; ++i) fsf[i] = static_cast<int32_t>(r.get(6));
    for (int i = 0; i < nb; ++i) {
      int bits = word_length_bits(fwl[i]);
      if (bits <= 0) continue;
      for (int k = 0; k < kSpecsPerBfu[i]; ++k) {
        fq[i * kMaxBfuSize + k] = r.get_signed(bits);
      }
    }
  }
}

// f32 [-1,1] -> int16 with clamp + asymmetric scale + trunc-toward-zero
// (processor.js:361-371 / DataView.setInt16 ToInteger semantics).
void carta1_float_to_int16(const float* in, int64_t n, int16_t* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double x = in[i];
    if (x < -1.0) x = -1.0;
    if (x > 1.0) x = 1.0;
    double scaled = x < 0 ? x * 32768.0 : x * 32767.0;
    out[i] = static_cast<int16_t>(std::trunc(scaled));
  }
}

void carta1_int16_to_float(const int16_t* in, int64_t n, float* out) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    out[i] = static_cast<float>(in[i]) / 32768.0f;
  }
}

int carta1_native_version() { return 1; }

}  // extern "C"
