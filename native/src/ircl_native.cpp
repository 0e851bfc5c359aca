// ircl_native: host-side native kernels for the ircl_tpu framework.
//
// Currently provides:
//   - ircl_murmur3_batch: MurmurHash3 x86_32 over a packed batch of UTF-8
//     strings (the index-build hot path: millions of hashed ngrams).
//   - ircl_bincount_pairs: (row=hash, col=doc) COO duplicate-merge helper used
//     by the sparse index builder.
//
// The compute path of the framework is JAX/XLA/Pallas on TPU; this library is
// the CPU runtime for text->feature-id transformation, mirroring the role the
// reference delegates to sklearn's Cython murmurhash and scipy's C CSR
// assembly (see SURVEY.md section 2.3).

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

inline uint32_t rotl32(uint32_t x, int8_t r) {
  return (x << r) | (x >> (32 - r));
}

inline uint32_t fmix32(uint32_t h) {
  h ^= h >> 16;
  h *= 0x85ebca6bu;
  h ^= h >> 13;
  h *= 0xc2b2ae35u;
  h ^= h >> 16;
  return h;
}

uint32_t murmur3_x86_32(const uint8_t* data, int64_t len, uint32_t seed) {
  const int64_t nblocks = len / 4;
  uint32_t h1 = seed;
  const uint32_t c1 = 0xcc9e2d51u;
  const uint32_t c2 = 0x1b873593u;

  for (int64_t i = 0; i < nblocks; i++) {
    uint32_t k1;
    std::memcpy(&k1, data + 4 * i, 4);  // little-endian assumed (x86/ARM LE)
    k1 *= c1;
    k1 = rotl32(k1, 15);
    k1 *= c2;
    h1 ^= k1;
    h1 = rotl32(h1, 13);
    h1 = h1 * 5 + 0xe6546b64u;
  }

  const uint8_t* tail = data + nblocks * 4;
  uint32_t k1 = 0;
  switch (len & 3) {
    case 3:
      k1 ^= static_cast<uint32_t>(tail[2]) << 16;
      [[fallthrough]];
    case 2:
      k1 ^= static_cast<uint32_t>(tail[1]) << 8;
      [[fallthrough]];
    case 1:
      k1 ^= tail[0];
      k1 *= c1;
      k1 = rotl32(k1, 15);
      k1 *= c2;
      h1 ^= k1;
  }

  h1 ^= static_cast<uint32_t>(len);
  return fmix32(h1);
}

}  // namespace

extern "C" {

// Hash n UTF-8 strings packed back-to-back in `packed`, with
// offsets[i]..offsets[i+1] delimiting string i. Writes n uint32 hashes.
void ircl_murmur3_batch(const char* packed, const int64_t* offsets, int64_t n,
                        uint32_t seed, uint32_t* out) {
  const uint8_t* base = reinterpret_cast<const uint8_t*>(packed);
  for (int64_t i = 0; i < n; i++) {
    out[i] = murmur3_x86_32(base + offsets[i], offsets[i + 1] - offsets[i], seed);
  }
}

// Merge duplicate (row, col) COO entries by summing data. Input arrays of
// length n; outputs written into out_* arrays (capacity n). Returns the number
// of unique pairs. Rows are hash buckets (int64), cols are doc indices
// (int32), data are counts (int32).
int64_t ircl_coo_dedup(const int64_t* rows, const int32_t* cols,
                       const int32_t* data, int64_t n, int64_t* out_rows,
                       int32_t* out_cols, int32_t* out_data) {
  std::unordered_map<uint64_t, int32_t> acc;
  acc.reserve(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; i++) {
    // rows < 2^24 and cols < 2^31 fit together in 64 bits: key = row<<32 | col
    uint64_t key = (static_cast<uint64_t>(rows[i]) << 32) |
                   static_cast<uint32_t>(cols[i]);
    acc[key] += data[i];
  }
  int64_t m = 0;
  for (const auto& kv : acc) {
    out_rows[m] = static_cast<int64_t>(kv.first >> 32);
    out_cols[m] = static_cast<int32_t>(kv.first & 0xffffffffu);
    out_data[m] = kv.second;
    m++;
  }
  return m;
}

}  // extern "C"
