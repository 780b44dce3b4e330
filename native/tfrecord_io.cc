// TFRecord framing IO — native reader/writer for the input pipeline.
//
// The reference feeds training through tf.data's TFRecordDataset
// (/root/reference/src/dataloader.py:487-526). This standalone C++ library
// provides the equivalent storage layer without TensorFlow: length-prefixed
// records with masked CRC32C checksums,
//
//   uint64 length | uint32 masked_crc32c(length) | bytes data |
//   uint32 masked_crc32c(data)
//
// exposed through a C ABI for ctypes. Hot paths (CRC, scan, bulk read) are
// C++; Python composes them into the high-level pipeline.
//
// Build: g++ -O3 -shared -fPIC -o libtfrecord_io.so tfrecord_io.cc

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

// ---- CRC32C (Castagnoli), table-driven, 8 tables for speed ----
uint32_t kCrcTable[8][256];
bool crc_init_done = false;

void CrcInit() {
  if (crc_init_done) return;
  const uint32_t poly = 0x82f63b78u;  // reflected CRC32C polynomial
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++) c = (c & 1) ? poly ^ (c >> 1) : c >> 1;
    kCrcTable[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = kCrcTable[0][i];
    for (int t = 1; t < 8; t++) {
      c = kCrcTable[0][c & 0xff] ^ (c >> 8);
      kCrcTable[t][i] = c;
    }
  }
  crc_init_done = true;
}

uint32_t Crc32c(const uint8_t* data, size_t n) {
  CrcInit();
  uint32_t crc = 0xffffffffu;
  // process 8 bytes at a time
  while (n >= 8) {
    uint64_t word;
    memcpy(&word, data, 8);
    word ^= crc;
    crc = kCrcTable[7][word & 0xff] ^ kCrcTable[6][(word >> 8) & 0xff] ^
          kCrcTable[5][(word >> 16) & 0xff] ^ kCrcTable[4][(word >> 24) & 0xff] ^
          kCrcTable[3][(word >> 32) & 0xff] ^ kCrcTable[2][(word >> 40) & 0xff] ^
          kCrcTable[1][(word >> 48) & 0xff] ^ kCrcTable[0][(word >> 56) & 0xff];
    data += 8;
    n -= 8;
  }
  while (n--) crc = kCrcTable[0][(crc ^ *data++) & 0xff] ^ (crc >> 8);
  return crc ^ 0xffffffffu;
}

constexpr uint32_t kMaskDelta = 0xa282ead8u;

uint32_t MaskCrc(uint32_t crc) {
  return ((crc >> 15) | (crc << 17)) + kMaskDelta;
}

uint32_t UnmaskCrc(uint32_t masked) {
  uint32_t rot = masked - kMaskDelta;
  return (rot >> 17) | (rot << 15);
}

}  // namespace

extern "C" {

// Scan a TFRecord file: fill offsets/lengths arrays (caller-allocated with
// capacity `max_records`). Returns the number of records, or -1 on IO error,
// -2 on CRC/framing corruption. `verify_crc` != 0 checks data checksums.
long long tfr_scan(const char* path, long long* offsets, long long* lengths,
                   long long max_records, int verify_crc) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  long long count = 0;
  std::vector<uint8_t> buf;
  for (;;) {
    uint8_t header[12];
    size_t got = fread(header, 1, 12, f);
    if (got == 0) break;              // clean EOF
    if (got != 12) { fclose(f); return -2; }
    uint64_t len;
    uint32_t len_crc_masked;
    memcpy(&len, header, 8);
    memcpy(&len_crc_masked, header + 8, 4);
    if (UnmaskCrc(len_crc_masked) != Crc32c(header, 8)) { fclose(f); return -2; }
    long long data_off = (long long)ftell(f);
    if (count < max_records) {
      offsets[count] = data_off;
      lengths[count] = (long long)len;
    }
    if (verify_crc) {
      buf.resize(len);
      if (fread(buf.data(), 1, len, f) != len) { fclose(f); return -2; }
      uint32_t data_crc_masked;
      if (fread(&data_crc_masked, 1, 4, f) != 4) { fclose(f); return -2; }
      if (UnmaskCrc(data_crc_masked) != Crc32c(buf.data(), len)) {
        fclose(f);
        return -2;
      }
    } else {
      if (fseek(f, (long)(len + 4), SEEK_CUR) != 0) { fclose(f); return -2; }
    }
    count++;
  }
  fclose(f);
  return count;
}

// Read one record's payload at a known offset/length into caller buffer.
int tfr_read_at(const char* path, long long offset, long long length,
                uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, (long)offset, SEEK_SET) != 0) { fclose(f); return -1; }
  size_t got = fread(out, 1, (size_t)length, f);
  fclose(f);
  return got == (size_t)length ? 0 : -1;
}

// Streaming writer handle.
struct TfrWriter {
  FILE* f;
};

void* tfr_writer_open(const char* path) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  TfrWriter* w = new TfrWriter{f};
  return w;
}

int tfr_writer_write(void* handle, const uint8_t* data, long long length) {
  TfrWriter* w = (TfrWriter*)handle;
  uint64_t len = (uint64_t)length;
  uint8_t header[12];
  memcpy(header, &len, 8);
  uint32_t len_crc = MaskCrc(Crc32c(header, 8));
  memcpy(header + 8, &len_crc, 4);
  if (fwrite(header, 1, 12, w->f) != 12) return -1;
  if (fwrite(data, 1, (size_t)length, w->f) != (size_t)length) return -1;
  uint32_t data_crc = MaskCrc(Crc32c(data, (size_t)length));
  if (fwrite(&data_crc, 1, 4, w->f) != 4) return -1;
  return 0;
}

int tfr_writer_close(void* handle) {
  TfrWriter* w = (TfrWriter*)handle;
  int rc = fclose(w->f);
  delete w;
  return rc;
}

// crc32c exposure for tests
unsigned int tfr_crc32c(const uint8_t* data, long long n) {
  return Crc32c(data, (size_t)n);
}

}  // extern "C"
