// Fast BGEN probability-block decoder (layouts 1 and 2).
//
// Native replacement for the per-variant Python decode in
// dissect_tpu/io/bgen.py, mirroring the reference's use of a native
// bgen library (genotypebgen.cpp:21-122): zlib/zstd decompression and
// bit-unpacking of genotype probabilities run in C++ with OpenMP
// parallelism over variants, producing expected allele-2 dosages
// (NaN = missing).  Exposed via ctypes (dissect_tpu/native/bgen_native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include <zlib.h>
#include <zstd.h>

namespace {

// Little-endian bit-packed unsigned read of width `bits` (1..32).
inline uint64_t read_bits(const uint8_t* buf, int64_t buflen, uint64_t bit_off,
                          int bits) {
  const uint64_t byte_off = bit_off >> 3;
  const int shift = static_cast<int>(bit_off & 7);
  uint64_t v = 0;
  const int need = (shift + bits + 7) / 8;
  for (int i = 0; i < need && static_cast<int64_t>(byte_off) + i < buflen; ++i) {
    v |= static_cast<uint64_t>(buf[byte_off + i]) << (8 * i);
  }
  v >>= shift;
  if (bits < 64) v &= (static_cast<uint64_t>(1) << bits) - 1;
  return v;
}

// Decompress one genotype block if needed.  Returns pointer/length of
// the uncompressed data (into `ubuf` when decompression ran) or nullptr
// on failure.  Layout 2 blocks carry a 4-byte uncompressed-length
// prefix; layout 1 zlib blocks do not (expected length passed in).
const uint8_t* expand(const uint8_t* blk, int64_t blen, int compression,
                      int64_t expected_len, std::vector<uint8_t>& ubuf,
                      int64_t* out_len) {
  if (compression == 0) {
    *out_len = blen;
    return blk;
  }
  uint32_t want;
  const uint8_t* payload;
  int64_t payload_len;
  if (expected_len >= 0) {  // layout 1: no length prefix
    want = static_cast<uint32_t>(expected_len);
    payload = blk;
    payload_len = blen;
  } else {
    if (blen < 4) return nullptr;
    std::memcpy(&want, blk, 4);
    payload = blk + 4;
    payload_len = blen - 4;
  }
  ubuf.resize(want);
  if (compression == 1) {
    uLongf dest = want;
    if (uncompress(ubuf.data(), &dest, payload,
                   static_cast<uLong>(payload_len)) != Z_OK ||
        dest != want) {
      return nullptr;
    }
  } else if (compression == 2) {
    const size_t r = ZSTD_decompress(ubuf.data(), want, payload,
                                     static_cast<size_t>(payload_len));
    if (ZSTD_isError(r) || r != want) return nullptr;
  } else {
    return nullptr;
  }
  *out_len = want;
  return ubuf.data();
}

}  // namespace

extern "C" {

// Layout-2 bulk decode.  `data` is the raw file; offsets/lengths select
// each variant's genotype block.  out: (n_variants, n_samples) float32,
// NaN = missing.  status[v]: 0 ok, 1 unsupported/corrupt (the Python
// caller falls back to its per-variant parser for those rows).
void dissect_decode_bgen_l2(const uint8_t* data, const int64_t* offsets,
                            const int64_t* lengths, int64_t n_variants,
                            int64_t n_samples, int compression, float* out,
                            int32_t* status) {
  // sanity cap: a diploid-biallelic block never exceeds 10 + N + 8 N bytes
  const uint32_t max_want = static_cast<uint32_t>(10 + 9 * n_samples + 1024);
#pragma omp parallel
  {
    std::vector<uint8_t> ubuf;
#pragma omp for schedule(dynamic, 16)
    for (int64_t v = 0; v < n_variants; ++v) {
      status[v] = 1;
      const uint8_t* blk = data + offsets[v];
      const int64_t blen = lengths[v];
      if (compression != 0 && blen >= 4) {
        uint32_t want;
        std::memcpy(&want, blk, 4);
        if (want > max_want) continue;
      }
      int64_t ulen = 0;
      const uint8_t* u = expand(blk, blen, compression, -1, ubuf, &ulen);
      if (u == nullptr || ulen < 10) continue;
      uint32_t n;
      uint16_t n_alleles;
      std::memcpy(&n, u, 4);
      std::memcpy(&n_alleles, u + 4, 2);
      if (static_cast<int64_t>(n) != n_samples || n_alleles != 2) continue;
      if (ulen < 10 + static_cast<int64_t>(n)) continue;
      const uint8_t* ploidy = u + 8;
      const uint8_t phased = u[8 + n];
      const uint8_t bits = u[9 + n];
      if (bits < 1 || bits > 32) continue;
      const uint8_t* probs = u + 10 + n;
      const int64_t plen = ulen - 10 - n;
      const double denom =
          static_cast<double>((static_cast<uint64_t>(1) << bits) - 1);
      float* dst = out + v * n_samples;
      bool ok = true;
      for (uint32_t s = 0; s < n; ++s) {
        const bool missing = (ploidy[s] & 0x80) != 0;
        if ((ploidy[s] & 0x3F) != 2) {  // diploid only (incl. missing slots:
          ok = false;                   // their entries still occupy the
          break;                        // stream, so indexing would shift)
        }
        const uint64_t e0 =
            read_bits(probs, plen, static_cast<uint64_t>(2 * s) * bits, bits);
        const uint64_t e1 = read_bits(
            probs, plen, static_cast<uint64_t>(2 * s + 1) * bits, bits);
        const double v0 = static_cast<double>(e0) / denom;
        const double v1 = static_cast<double>(e1) / denom;
        double d;
        if (phased) {
          d = (1.0 - v0) + (1.0 - v1);
        } else {
          double p22 = 1.0 - v0 - v1;
          if (p22 < 0.0) p22 = 0.0;
          if (p22 > 1.0) p22 = 1.0;
          d = v1 + 2.0 * p22;
        }
        dst[s] = missing ? NAN : static_cast<float>(d);
      }
      if (ok) status[v] = 0;
    }
  }
}

// Layout-1 (v1.1) bulk decode: uint16 probability triples / 32768,
// all-zero triple = missing; zlib (1) or uncompressed (0) blocks.
void dissect_decode_bgen_l1(const uint8_t* data, const int64_t* offsets,
                            const int64_t* lengths, int64_t n_variants,
                            int64_t n_samples, int compression, float* out,
                            int32_t* status) {
  const int64_t expected = 6 * n_samples;
#pragma omp parallel
  {
    std::vector<uint8_t> ubuf;
#pragma omp for schedule(dynamic, 16)
    for (int64_t v = 0; v < n_variants; ++v) {
      status[v] = 1;
      int64_t ulen = 0;
      const uint8_t* u = expand(data + offsets[v], lengths[v], compression,
                                expected, ubuf, &ulen);
      if (u == nullptr || ulen != expected) continue;
      float* dst = out + v * n_samples;
      for (int64_t s = 0; s < n_samples; ++s) {
        uint16_t p[3];
        std::memcpy(p, u + 6 * s, 6);
        const double psum = (p[0] + p[1] + p[2]) / 32768.0;
        if (psum <= 0.0) {
          dst[s] = NAN;
        } else {
          dst[s] = static_cast<float>(
              ((p[1] + 2.0 * p[2]) / 32768.0) / psum);
        }
      }
      status[v] = 0;
    }
  }
}

}  // extern "C"
