// Native host-IO kernels for the data layer.
//
// The reference delegated its host IO to TensorFlow's C++ tf.data
// runtime; this library is the equivalent native component for
// qpwcnet_tpu's self-contained pipeline: CRC32C (Castagnoli,
// slicing-by-8 — ~20x the python table loop) and TFRecord frame
// assembly/parsing, exposed through a C ABI consumed via ctypes
// (qpwcnet_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>

namespace {

uint32_t g_tables[8][256];
bool g_init = false;

void init_tables() {
  if (g_init) return;
  const uint32_t poly = 0x82F63B78u;  // reflected Castagnoli
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int k = 0; k < 8; ++k)
      crc = (crc >> 1) ^ ((crc & 1) ? poly : 0);
    g_tables[0][i] = crc;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = g_tables[0][i];
    for (int t = 1; t < 8; ++t) {
      crc = (crc >> 8) ^ g_tables[0][crc & 0xFF];
      g_tables[t][i] = crc;
    }
  }
  g_init = true;
}

uint32_t crc32c_impl(const uint8_t* data, size_t n, uint32_t crc) {
  init_tables();
  crc = ~crc;
  // slicing-by-8
  while (n >= 8) {
    uint64_t word;
    std::memcpy(&word, data, 8);
    word ^= static_cast<uint64_t>(crc);
    crc = g_tables[7][word & 0xFF] ^
          g_tables[6][(word >> 8) & 0xFF] ^
          g_tables[5][(word >> 16) & 0xFF] ^
          g_tables[4][(word >> 24) & 0xFF] ^
          g_tables[3][(word >> 32) & 0xFF] ^
          g_tables[2][(word >> 40) & 0xFF] ^
          g_tables[1][(word >> 48) & 0xFF] ^
          g_tables[0][(word >> 56) & 0xFF];
    data += 8;
    n -= 8;
  }
  while (n--) crc = (crc >> 8) ^ g_tables[0][(crc ^ *data++) & 0xFF];
  return ~crc;
}

uint32_t masked(uint32_t crc) {
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

}  // namespace

extern "C" {

uint32_t qpwc_crc32c(const uint8_t* data, uint64_t n) {
  return crc32c_impl(data, static_cast<size_t>(n), 0);
}

uint32_t qpwc_masked_crc32c(const uint8_t* data, uint64_t n) {
  return masked(crc32c_impl(data, static_cast<size_t>(n), 0));
}

// Assemble one TFRecord frame around `data` into `out`
// (length u64 | masked-crc(length) u32 | data | masked-crc(data) u32).
// `out` must have room for n + 16 bytes. Returns bytes written.
uint64_t qpwc_tfrecord_frame(const uint8_t* data, uint64_t n,
                             uint8_t* out) {
  std::memcpy(out, &n, 8);
  uint32_t len_crc = masked(crc32c_impl(out, 8, 0));
  std::memcpy(out + 8, &len_crc, 4);
  std::memcpy(out + 12, data, n);
  uint32_t data_crc = masked(crc32c_impl(data, n, 0));
  std::memcpy(out + 12 + n, &data_crc, 4);
  return n + 16;
}

// Parse TFRecord frames from a buffer: writes (offset, length) pairs of
// record payloads into `spans` (capacity `max_records` pairs). Returns
// the number of records found, or -1 on a malformed frame. CRCs are
// verified when verify != 0.
int64_t qpwc_tfrecord_scan(const uint8_t* buf, uint64_t n,
                           uint64_t* spans, uint64_t max_records,
                           int verify) {
  uint64_t pos = 0;
  int64_t count = 0;
  while (pos + 12 <= n) {
    uint64_t len;
    std::memcpy(&len, buf + pos, 8);
    if (pos + 16 + len > n) break;
    if (verify) {
      uint32_t want;
      std::memcpy(&want, buf + pos + 8, 4);
      if (masked(crc32c_impl(buf + pos, 8, 0)) != want) return -1;
      std::memcpy(&want, buf + pos + 12 + len, 4);
      if (masked(crc32c_impl(buf + pos + 12, len, 0)) != want) return -1;
    }
    if (static_cast<uint64_t>(count) < max_records) {
      spans[2 * count] = pos + 12;
      spans[2 * count + 1] = len;
    }
    ++count;
    pos += 16 + len;
  }
  return count;
}

}  // extern "C"
