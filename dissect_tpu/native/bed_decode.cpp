// Fast PLINK .bed 2-bit decoder.
//
// Native replacement for the reference's OpenMP BED parsing
// (parseSNPbyte + readBEDFile, genotype.cpp:548-787): each packed byte
// holds 4 genotypes; a 256x4 lookup table expands bytes to allele2
// dosages (-1 = missing) with OpenMP parallelism over SNP rows.
// Exposed to Python via ctypes (dissect_tpu/native/bed_native.py).

#include <cstdint>
#include <cstring>

namespace {

// code -> dosage: 0b00 -> 0, 0b01 -> missing(-1), 0b10 -> 1, 0b11 -> 2
// (parity: parseSNPbyte, genotype.cpp:752-776)
const int8_t kCode[4] = {0, -1, 1, 2};

struct Lut {
  int8_t table[256][4];
  Lut() {
    for (int b = 0; b < 256; ++b) {
      for (int j = 0; j < 4; ++j) {
        table[b][j] = kCode[(b >> (2 * j)) & 0x3];
      }
    }
  }
};

const Lut kLut;

}  // namespace

extern "C" {

// rows: (n_rows, n_bytes_per_row) packed payload; out: (n_rows, n_individuals)
void dissect_decode_bed(const uint8_t* rows, int64_t n_rows,
                        int64_t n_bytes_per_row, int64_t n_individuals,
                        int8_t* out) {
  const int64_t full_bytes = n_individuals / 4;
  const int64_t rest = n_individuals - full_bytes * 4;
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rows; ++r) {
    const uint8_t* src = rows + r * n_bytes_per_row;
    int8_t* dst = out + r * n_individuals;
    for (int64_t b = 0; b < full_bytes; ++b) {
      std::memcpy(dst + 4 * b, kLut.table[src[b]], 4);
    }
    if (rest > 0) {
      const int8_t* last = kLut.table[src[full_bytes]];
      for (int64_t j = 0; j < rest; ++j) {
        dst[4 * full_bytes + j] = last[j];
      }
    }
  }
}

// Per-SNP genotype counts (frequencies[0..3] analog, genotype.cpp:736-738):
// counts[r*4 + c] = #genotypes with dosage c-1 (c=0 -> missing).
void dissect_bed_counts(const uint8_t* rows, int64_t n_rows,
                        int64_t n_bytes_per_row, int64_t n_individuals,
                        int64_t* counts) {
#pragma omp parallel for schedule(static)
  for (int64_t r = 0; r < n_rows; ++r) {
    const uint8_t* src = rows + r * n_bytes_per_row;
    int64_t local[4] = {0, 0, 0, 0};
    for (int64_t i = 0; i < n_individuals; ++i) {
      const int code = (src[i / 4] >> (2 * (i % 4))) & 0x3;
      ++local[code];
    }
    // remap 2-bit code -> dosage bucket (missing, 0, 1, 2)
    counts[r * 4 + 0] = local[1];
    counts[r * 4 + 1] = local[0];
    counts[r * 4 + 2] = local[2];
    counts[r * 4 + 3] = local[3];
  }
}

}  // extern "C"
