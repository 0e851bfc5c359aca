// ircl_native: host-side native kernels for the ircl_tpu framework.
//
// Currently provides:
//   - ircl_murmur3_batch: MurmurHash3 x86_32 over a packed batch of UTF-8
//     strings (the index-build hot path: millions of hashed ngrams).
//   - df-split fill, CSR counting-sort/window slice, light-pool gather,
//     and the sequence tokenizer (see each function's comment).
//
// The compute path of the framework is JAX/XLA/Pallas on TPU; this library is
// the CPU runtime for text->feature-id transformation, mirroring the role the
// reference delegates to sklearn's Cython murmurhash and scipy's C CSR
// assembly (see SURVEY.md section 2.3).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <utility>
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

// Max total light postings over any query in the batch (pool sizing pass;
// one indptr lookup per (query, term)).
int64_t ircl_light_pool_max(const int32_t* buckets, const float* weights,
                            int64_t B, int64_t T, const int64_t* light_indptr) {
  int64_t mx = 0;
  for (int64_t b = 0; b < B; b++) {
    int64_t tot = 0;
    const int64_t base = b * T;
    for (int64_t t = 0; t < T; t++) {
      if (weights[base + t] == 0.0f) continue;
      const int64_t h = buckets[base + t];
      tot += light_indptr[h + 1] - light_indptr[h];
    }
    if (tot > mx) mx = tot;
  }
  return mx;
}

// Per-query light posting pools: contiguous CSR slices gathered, optionally
// remapped through old2pos (the width-bucket permutation) and doc-sorted
// ascending (stable), padded with (pad_doc, 0). The serving-path replacement
// for the numpy gather in ircl_tpu/index/split.py::gather_light_pools.
// Returns the max fill, or -1 if some query exceeds capacity P.
int64_t ircl_gather_light_pools(
    const int32_t* buckets, const float* weights, int64_t B, int64_t T,
    const int64_t* light_indptr, const int32_t* light_docs,
    const float* light_vals, const int32_t* old2pos /* nullable */,
    int32_t pad_doc, int32_t sort_pools, int32_t* out_docs,
    float* out_contribs, int64_t P) {
  std::vector<std::pair<int32_t, float>> pool;
  pool.reserve(static_cast<size_t>(P));
  int64_t mx = 0;
  for (int64_t b = 0; b < B; b++) {
    pool.clear();
    const int64_t base = b * T;
    for (int64_t t = 0; t < T; t++) {
      const float w = weights[base + t];
      if (w == 0.0f) continue;
      const int64_t h = buckets[base + t];
      const int64_t lo = light_indptr[h], hi = light_indptr[h + 1];
      if (static_cast<int64_t>(pool.size()) + (hi - lo) > P) return -1;
      for (int64_t i = lo; i < hi; i++) {
        int32_t d = light_docs[i];
        if (old2pos) d = old2pos[d];
        pool.emplace_back(d, light_vals[i] * w);
      }
    }
    if (mx < static_cast<int64_t>(pool.size()))
      mx = static_cast<int64_t>(pool.size());
    if (sort_pools)
      std::stable_sort(
          pool.begin(), pool.end(),
          [](const std::pair<int32_t, float>& a,
             const std::pair<int32_t, float>& b) { return a.first < b.first; });
    int32_t* od = out_docs + b * P;
    float* oc = out_contribs + b * P;
    int64_t i = 0;
    for (; i < static_cast<int64_t>(pool.size()); i++) {
      od[i] = pool[i].first;
      oc[i] = pool[i].second;
    }
    for (; i < P; i++) {
      od[i] = pad_doc;
      oc[i] = 0.0f;
    }
  }
  return mx;
}

// ---- COO -> term-major CSR scatter (index/build.py::assemble_csr) ---------
//
// Counting-sort replacement for lexsort((col, row)) + three fancy-index
// permutes (~13s at 5.5M postings on this host): one stable pass. The
// caller guarantees doc-major input (col non-decreasing), so each bucket's
// postings come out doc-ascending — identical to the lexsort. cursor
// [hash_size] is initialized to indptr[:-1] by the caller.
void ircl_csr_scatter(const int64_t* row, const int32_t* col,
                      const int32_t* val, int64_t nnz, int64_t* cursor,
                      int32_t* out_docs, float* out_vals) {
  for (int64_t i = 0; i < nnz; i++) {
    const int64_t p = cursor[row[i]]++;
    out_docs[p] = col[i];
    out_vals[p] = static_cast<float>(val[i]);
  }
}

// ---- doc-range slice of a term-major CSR (index/chunked.py) ---------------
//
// Posting lists are doc-ascending, so a chunk's postings are a contiguous
// window inside every term's slice: two binary searches per term find it,
// and one sequential pass copies it — no per-posting mask or term-id
// materialization over the full corpus (the numpy formulation repeats +
// bincounts all postings PER CHUNK: minutes at the 447M-posting full-wiki
// scale).

void ircl_csr_doc_window(const int64_t* indptr, int64_t hash_size,
                         const int32_t* post_docs, int32_t lo, int32_t hi,
                         int64_t* out_start, int64_t* out_end) {
  for (int64_t t = 0; t < hash_size; t++) {
    const int32_t* b = post_docs + indptr[t];
    const int64_t n = indptr[t + 1] - indptr[t];
    out_start[t] = indptr[t] + (std::lower_bound(b, b + n, lo) - b);
    out_end[t] = indptr[t] + (std::lower_bound(b, b + n, hi) - b);
  }
}

void ircl_csr_window_extract(const int64_t* start, const int64_t* end,
                             int64_t hash_size, const int32_t* post_docs,
                             const float* post_vals, int32_t lo,
                             int32_t* out_docs, float* out_vals) {
  int64_t p = 0;
  for (int64_t t = 0; t < hash_size; t++) {
    for (int64_t i = start[t]; i < end[t]; i++) {
      out_docs[p] = post_docs[i] - lo;
      out_vals[p] = post_vals[i];
      p++;
    }
  }
}

// ---- df-split index build (index/split.py::split_index fast path) ---------
//
// The numpy formulation (repeat term ids per posting, boolean-extract the
// heavy postings, stable-sort by doc, scatter into the ELL) costs ~50s at
// 1M docs / 83M postings on the 1-core host; these two sequential passes
// over the term-major CSR do the same work in ~2s. Terms are visited in
// ascending order, so each doc's ELL row comes out ascending and the light
// postings keep their term-major order — bit-identical layouts to the
// numpy path (parity-tested).

// Pass 1: per-doc heavy posting count. widths [num_docs] zeroed by caller.
void ircl_split_widths(const int64_t* indptr, int64_t hash_size,
                       const int32_t* post_docs, const uint8_t* heavy_mask,
                       int32_t* widths) {
  for (int64_t t = 0; t < hash_size; t++) {
    if (!heavy_mask[t]) continue;
    for (int64_t i = indptr[t]; i < indptr[t + 1]; i++) widths[post_docs[i]]++;
  }
}

// Pass 2: fill the heavy ELL (out_terms -1-prefilled, out_vals zeroed,
// fill [num_docs] zeroed) and append light postings in term-major order.
// Returns the number of light postings written (caller asserts == expected).
int64_t ircl_split_fill(const int64_t* indptr, int64_t hash_size,
                        const int32_t* post_docs, const float* post_vals,
                        const uint8_t* heavy_mask, int64_t K,
                        int32_t* out_terms, float* out_vals, int32_t* fill,
                        int32_t* light_docs_out, float* light_vals_out) {
  int64_t lp = 0;
  for (int64_t t = 0; t < hash_size; t++) {
    const int64_t lo = indptr[t], hi = indptr[t + 1];
    if (heavy_mask[t]) {
      for (int64_t i = lo; i < hi; i++) {
        const int64_t d = post_docs[i];
        const int64_t c = fill[d]++;
        out_terms[d * K + c] = static_cast<int32_t>(t);
        out_vals[d * K + c] = post_vals[i];
      }
    } else {
      for (int64_t i = lo; i < hi; i++) {
        light_docs_out[lp] = post_docs[i];
        light_vals_out[lp] = post_vals[i];
        lp++;
      }
    }
  }
  return lp;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// ASCII fast-path query/document vectorizer.
//
// For pure-ASCII input this reproduces, bit-exactly, the Python pipeline
// SimpleTokenizer -> ngrams(n, uncased, filter_ngram) -> murmur3 % hash_size
// -> unique+counts (see ircl_tpu/corpus/*). Non-ASCII strings must take the
// Python fallback (unicode category tables are not replicated here).
// ---------------------------------------------------------------------------

namespace {

inline bool is_alnum_ascii(uint8_t c) {
  return (c >= '0' && c <= '9') || (c >= 'a' && c <= 'z') ||
         (c >= 'A' && c <= 'Z');
}

// ASCII \p{Z} is ' ' (0x20); \p{C} is 0x00-0x1f and 0x7f.
inline bool is_ws_or_ctrl(uint8_t c) { return c == 0x20 || c < 0x20 || c == 0x7f; }

// ASCII \p{P}: ! " # % & ' ( ) * , - . / : ; ? @ [ \ ] _ { }
inline bool is_punct_ascii(uint8_t c) {
  switch (c) {
    case '!': case '"': case '#': case '%': case '&': case '\'': case '(':
    case ')': case '*': case ',': case '-': case '.': case '/': case ':':
    case ';': case '?': case '@': case '[': case '\\': case ']': case '_':
    case '{': case '}':
      return true;
    default:
      return false;
  }
}

const std::unordered_set<std::string>& stopwords() {
  static const std::unordered_set<std::string> kStop = {
      "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
      "your", "yours", "yourself", "yourselves", "he", "him", "his",
      "himself", "she", "her", "hers", "herself", "it", "its", "itself",
      "they", "them", "their", "theirs", "themselves", "what", "which",
      "who", "whom", "this", "that", "these", "those", "am", "is", "are",
      "was", "were", "be", "been", "being", "have", "has", "had", "having",
      "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
      "or", "because", "as", "until", "while", "of", "at", "by", "for",
      "with", "about", "against", "between", "into", "through", "during",
      "before", "after", "above", "below", "to", "from", "up", "down", "in",
      "out", "on", "off", "over", "under", "again", "further", "then",
      "once", "here", "there", "when", "where", "why", "how", "all", "any",
      "both", "each", "few", "more", "most", "other", "some", "such", "no",
      "nor", "not", "only", "own", "same", "so", "than", "too", "very", "s",
      "t", "can", "will", "just", "don", "should", "now", "d", "ll", "m",
      "o", "re", "ve", "y", "ain", "aren", "couldn", "didn", "doesn",
      "hadn", "hasn", "haven", "isn", "ma", "mightn", "mustn", "needn",
      "shan", "shouldn", "wasn", "weren", "won", "wouldn", "'ll", "'re",
      "'ve", "n't", "'s", "'d", "'m", "''", "``"};
  return kStop;
}

// filter_word for an already-lowercased ASCII token.
bool filter_word_ascii(const std::string& tok) {
  bool all_punct = !tok.empty();
  for (char c : tok) {
    if (!is_punct_ascii(static_cast<uint8_t>(c))) {
      all_punct = false;
      break;
    }
  }
  if (all_punct) return true;
  return stopwords().count(tok) > 0;
}

}  // namespace

extern "C" {

// Vectorize n ASCII texts into hashed-ngram (bucket, count) runs.
//
//   packed / offsets : texts packed back-to-back (offsets length n+1)
//   hash_size        : modulus for murmur3 bucket ids
//   ngram            : max ngram length (1..n-grams enumerated)
//   out_buckets / out_counts : capacity max_out entries, filled per text with
//                              buckets sorted ascending (np.unique parity)
//   out_offsets      : length n+1, run boundaries per text
//
// Returns total entries written, or -1 if max_out was exceeded.
int64_t ircl_vectorize_ascii(const char* packed, const int64_t* offsets,
                             int64_t n, int64_t hash_size, int32_t ngram,
                             int64_t* out_buckets, int32_t* out_counts,
                             int64_t* out_offsets, int64_t max_out) {
  int64_t written = 0;
  std::vector<std::string> words;
  std::vector<uint8_t> filtered;
  std::vector<std::pair<int64_t, int32_t>> uniq;
  std::unordered_map<int64_t, int32_t> counts;
  std::string gram;

  out_offsets[0] = 0;
  for (int64_t t = 0; t < n; t++) {
    const uint8_t* s = reinterpret_cast<const uint8_t*>(packed) + offsets[t];
    const int64_t len = offsets[t + 1] - offsets[t];

    // SimpleTokenizer, ASCII semantics: alnum runs | single printable
    // non-space chars, lowercased.
    words.clear();
    int64_t i = 0;
    while (i < len) {
      uint8_t c = s[i];
      if (is_alnum_ascii(c)) {
        int64_t j = i;
        std::string w;
        while (j < len && is_alnum_ascii(s[j])) {
          uint8_t ch = s[j];
          if (ch >= 'A' && ch <= 'Z') ch += 32;
          w.push_back(static_cast<char>(ch));
          j++;
        }
        words.push_back(std::move(w));
        i = j;
      } else if (!is_ws_or_ctrl(c)) {
        words.emplace_back(1, static_cast<char>(c));
        i++;
      } else {
        i++;
      }
    }

    filtered.clear();
    filtered.reserve(words.size());
    for (const auto& w : words) filtered.push_back(filter_word_ascii(w) ? 1 : 0);

    // ngrams 1..ngram with 'any' filtering, murmur3-hashed, counted.
    counts.clear();
    const int64_t W = static_cast<int64_t>(words.size());
    for (int64_t a = 0; a < W; a++) {
      if (filtered[a]) continue;  // any-mode: unigram filtered
      gram = words[a];
      int64_t h = static_cast<int64_t>(
                      murmur3_x86_32(reinterpret_cast<const uint8_t*>(gram.data()),
                                     static_cast<int64_t>(gram.size()), 0)) %
                  hash_size;
      counts[h]++;
      for (int64_t b = a + 1; b < std::min(a + ngram, W); b++) {
        if (filtered[b]) break;  // any token filtered kills all longer grams
        gram.push_back(' ');
        gram += words[b];
        h = static_cast<int64_t>(murmur3_x86_32(
                reinterpret_cast<const uint8_t*>(gram.data()),
                static_cast<int64_t>(gram.size()), 0)) %
            hash_size;
        counts[h]++;
      }
    }

    uniq.assign(counts.begin(), counts.end());
    std::sort(uniq.begin(), uniq.end());
    if (written + static_cast<int64_t>(uniq.size()) > max_out) return -1;
    for (const auto& kv : uniq) {
      out_buckets[written] = kv.first;
      out_counts[written] = kv.second;
      written++;
    }
    out_offsets[t + 1] = written;
  }
  return written;
}

// ASCII texts -> hashed token-id SEQUENCES (the training featurizer's
// encode_host hot path: SimpleTokenizer words, lowercased, NO stopword
// filtering, murmur3(seed 0) % vocab_buckets, truncated at L).
// out_ids [n, L] and out_mask [n, L] must be zero-prefilled by the caller.
void ircl_tokenize_hash_seq(const char* packed, const int64_t* offsets,
                            int64_t n, int64_t vocab_buckets, int64_t L,
                            int32_t* out_ids, float* out_mask) {
  std::string w;
  for (int64_t t = 0; t < n; t++) {
    const uint8_t* s = reinterpret_cast<const uint8_t*>(packed) + offsets[t];
    const int64_t len = offsets[t + 1] - offsets[t];
    int64_t k = 0;
    int64_t i = 0;
    while (i < len && k < L) {
      uint8_t c = s[i];
      if (is_alnum_ascii(c)) {
        int64_t j = i;
        w.clear();
        while (j < len && is_alnum_ascii(s[j])) {
          uint8_t ch = s[j];
          if (ch >= 'A' && ch <= 'Z') ch += 32;
          w.push_back(static_cast<char>(ch));
          j++;
        }
        i = j;
      } else if (!is_ws_or_ctrl(c)) {
        w.assign(1, static_cast<char>(c));
        i++;
      } else {
        i++;
        continue;
      }
      const int64_t h =
          static_cast<int64_t>(murmur3_x86_32(
              reinterpret_cast<const uint8_t*>(w.data()),
              static_cast<int64_t>(w.size()), 0)) %
          vocab_buckets;
      out_ids[t * L + k] = static_cast<int32_t>(h);
      out_mask[t * L + k] = 1.0f;
      k++;
    }
  }
}

}  // extern "C"
