// Native host-side kernels for the audiosourcesep_tpu data pipeline.
//
// The reference delegates TFRecord framing to TensorFlow's C++ IO stack
// (datasets/preprocessing.py:228-271); this library provides the same
// speed-of-light host path for our TF-free loader: CRC32C (Castagnoli,
// slicing-by-8) for record framing, plus PCM16 <-> float conversion used by
// the WAV loader. Built as a plain shared object, loaded via ctypes.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstddef>
#include <cstdint>
#include <cstring>

namespace {

uint32_t kTable[8][256];
bool table_init_done = false;

void init_tables() {
  if (table_init_done) return;
  const uint32_t poly = 0x82F63B78u;  // reversed Castagnoli
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int j = 0; j < 8; ++j)
      crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    kTable[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = kTable[0][i];
    for (int k = 1; k < 8; ++k) {
      crc = kTable[0][crc & 0xFF] ^ (crc >> 8);
      kTable[k][i] = crc;
    }
  }
  table_init_done = true;
}

}  // namespace

extern "C" {

// Raw CRC32C over a buffer (init 0xFFFFFFFF, final xor).
uint32_t asr_crc32c(const uint8_t* data, size_t n) {
  init_tables();
  uint32_t crc = 0xFFFFFFFFu;
  // slicing-by-8 main loop
  while (n >= 8) {
    uint32_t lo;
    uint32_t hi;
    std::memcpy(&lo, data, 4);
    std::memcpy(&hi, data + 4, 4);
    lo ^= crc;
    crc = kTable[7][lo & 0xFF] ^ kTable[6][(lo >> 8) & 0xFF] ^
          kTable[5][(lo >> 16) & 0xFF] ^ kTable[4][lo >> 24] ^
          kTable[3][hi & 0xFF] ^ kTable[2][(hi >> 8) & 0xFF] ^
          kTable[1][(hi >> 16) & 0xFF] ^ kTable[0][hi >> 24];
    data += 8;
    n -= 8;
  }
  while (n--) crc = kTable[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

// TFRecord "masked" CRC: rotate right by 15 and add a constant.
uint32_t asr_masked_crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = asr_crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

// PCM16 little-endian -> float32 in [-1, 1].
void asr_pcm16_to_f32(const int16_t* in, float* out, size_t n) {
  constexpr float kScale = 1.0f / 32768.0f;
  for (size_t i = 0; i < n; ++i) out[i] = in[i] * kScale;
}

// float32 -> PCM16 with clipping.
void asr_f32_to_pcm16(const float* in, int16_t* out, size_t n) {
  for (size_t i = 0; i < n; ++i) {
    float v = in[i] * 32768.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = static_cast<int16_t>(v);
  }
}

}  // extern "C"
