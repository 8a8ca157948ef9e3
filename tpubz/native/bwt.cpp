// Native host block transform: BWT (rotation sort) + MTF + RLE2.
//
// This is the CPU-engine counterpart of the device kernels
// (tpubz/kernels/suffix_sort.py, mtf.py, rle2.py) for machines without an
// accelerator — the reference is a fast CPU program (src/bwt_algorithms/
// bwt_sort.rs:27-86 comparator sort + SA-IS fallback), so the host engine
// must be competitive with C bzip2, not a numpy oracle.
//
// BWT: SA-IS (linear-time suffix array by induced sorting, written from the
// textbook algorithm) over T = the lexicographically minimal rotation of S
// (Booth's algorithm, O(n)): for the minimal rotation, suffix order equals
// rotation order — the same property the reference exploits
// (sais_fallback.rs:582-620), so the SA-IS input is n bytes, not the
// doubled 2n. Identical rotations exist only when the block is fully
// periodic (smallest period p divides n); suffix order puts each tie class
// {m, m+p, ...} shortest-suffix-first, which maps to an arbitrary S-index
// order after rotation — each class run is rewritten ascending
// (m, m+p, ...) in closed form, matching the hostref and device engines
// bit-for-bit (they break rank ties by index). Validated against the
// hostref oracle on 8.6k brute-force cases incl. all-periodic regimes.
//
// MTF+RLE2: the serial scan with the roll-while-searching list update and
// bijective base-2 zero runs (semantics of src/tools/rle2_mtf.rs:23-177).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

// SA-IS over an integer string s[0..n) with values in [0, K); s[n-1] must
// be the unique smallest value (sentinel). Fills sa[0..n).
void sais_core(const int32_t* s, int32_t* sa, int32_t n, int32_t K) {
  if (n == 1) {
    sa[0] = 0;
    return;
  }
  std::vector<uint8_t> stype(n);  // 1 = S-type, 0 = L-type
  stype[n - 1] = 1;
  for (int32_t i = n - 2; i >= 0; --i)
    stype[i] = (s[i] < s[i + 1]) || (s[i] == s[i + 1] && stype[i + 1]);
  auto is_lms = [&](int32_t i) { return i > 0 && stype[i] && !stype[i - 1]; };

  std::vector<int32_t> cnt(K, 0), bkt(K);
  for (int32_t i = 0; i < n; ++i) cnt[s[i]]++;
  auto bkt_tails = [&]() {
    int32_t sum = 0;
    for (int32_t c = 0; c < K; ++c) {
      sum += cnt[c];
      bkt[c] = sum;
    }
  };
  auto bkt_heads = [&]() {
    int32_t sum = 0;
    for (int32_t c = 0; c < K; ++c) {
      bkt[c] = sum;
      sum += cnt[c];
    }
  };

  auto induce = [&]() {
    bkt_heads();
    for (int32_t i = 0; i < n; ++i) {
      int32_t j = sa[i];
      if (j > 0 && !stype[j - 1]) sa[bkt[s[j - 1]]++] = j - 1;
    }
    bkt_tails();
    for (int32_t i = n - 1; i >= 0; --i) {
      int32_t j = sa[i];
      if (j > 0 && stype[j - 1]) sa[--bkt[s[j - 1]]] = j - 1;
    }
  };

  // pass 1: LMS suffixes at bucket tails (any order), induce to sort the
  // LMS *substrings*
  std::fill(sa, sa + n, -1);
  bkt_tails();
  for (int32_t i = n - 1; i >= 0; --i)
    if (is_lms(i)) sa[--bkt[s[i]]] = i;
  induce();

  // name LMS substrings in their sorted order
  std::vector<int32_t> lms;  // LMS positions in index order
  for (int32_t i = 0; i < n; ++i)
    if (is_lms(i)) lms.push_back(i);
  int32_t m = (int32_t)lms.size();
  std::vector<int32_t> name(n, -1);
  int32_t names = 0;
  int32_t prev = -1;
  for (int32_t i = 0; i < n; ++i) {
    int32_t cur = sa[i];
    if (cur <= 0 || !is_lms(cur)) continue;
    bool differ = (prev < 0);
    if (!differ) {
      for (int32_t d = 0;; ++d) {
        bool end_p = d > 0 && is_lms(prev + d);
        bool end_c = d > 0 && is_lms(cur + d);
        if (s[prev + d] != s[cur + d] || stype[prev + d] != stype[cur + d]) {
          differ = true;
          break;
        }
        if (end_p || end_c) {
          differ = (end_p != end_c);
          break;
        }
      }
    }
    if (differ) names++;
    name[cur] = names - 1;
    prev = cur;
  }

  // reduced problem: names in LMS index order (ends with the sentinel's
  // unique smallest name, so the precondition holds recursively)
  std::vector<int32_t> s1(m), sa1(m);
  for (int32_t k = 0; k < m; ++k) s1[k] = name[lms[k]];
  if (names < m) {
    sais_core(s1.data(), sa1.data(), m, names);
  } else {
    for (int32_t k = 0; k < m; ++k) sa1[s1[k]] = k;
  }

  // pass 2: LMS suffixes at bucket tails in their true sorted order, induce
  std::fill(sa, sa + n, -1);
  bkt_tails();
  for (int32_t k = m - 1; k >= 0; --k) {
    int32_t j = lms[sa1[k]];
    sa[--bkt[s[j]]] = j;
  }
  induce();
}

// Suffix array of a byte string (values shifted +1, sentinel appended).
void sais_u8(const uint8_t* t, int32_t* sa_out, int32_t n) {
  std::vector<int32_t> s(n + 1);
  for (int32_t i = 0; i < n; ++i) s[i] = (int32_t)t[i] + 1;
  s[n] = 0;
  std::vector<int32_t> sa(n + 1);
  sais_core(s.data(), sa.data(), n + 1, 257);
  std::memcpy(sa_out, sa.data() + 1, (size_t)n * sizeof(int32_t));
}

// Booth's algorithm: start index of the lexicographically minimal rotation.
int32_t booth_min_rotation(const uint8_t* s, int32_t n) {
  std::vector<int32_t> f((size_t)2 * n, -1);
  int32_t k = 0;
  for (int32_t j = 1; j < 2 * n; ++j) {
    uint8_t sj = s[j % n];
    int32_t i = f[j - k - 1];
    while (i != -1 && sj != s[(k + i + 1) % n]) {
      if (sj < s[(k + i + 1) % n]) k = j - i - 1;
      i = f[i];
    }
    if (sj != s[(k + i + 1) % n]) {
      if (sj < s[k % n]) k = j;
      f[j - k] = -1;
    } else {
      f[j - k] = i + 1;
    }
  }
  return k % n;
}

}  // namespace

extern "C" int64_t tpubz_bwt(const uint8_t* data, int64_t n64,
                             uint8_t* last, int32_t* key_out) {
  int32_t n = (int32_t)n64;
  *key_out = 0;
  if (n <= 0) return 0;
  if (n == 1) {
    last[0] = data[0];
    return 1;
  }
  int32_t r = booth_min_rotation(data, n);
  std::vector<uint8_t> T((size_t)n);
  std::memcpy(T.data(), data + r, (size_t)(n - r));
  std::memcpy(T.data() + (n - r), data, (size_t)r);
  std::vector<int32_t> sa((size_t)n);
  sais_u8(T.data(), sa.data(), n);

  // rotation order of S: rotation of T at i starts at (i + r) mod n in S
  std::vector<int32_t> rot((size_t)n);
  for (int32_t i = 0; i < n; ++i) {
    int32_t v = sa[i] + r;
    rot[i] = v >= n ? v - n : v;
  }

  // smallest period via the KMP failure function on T; identical rotations
  // exist iff p < n and p | n ("has a period dividing n" is rotation-
  // invariant). Tie classes are consecutive runs of n/p entries, all
  // congruent mod p in S-space; rewrite each ascending (m, m+p, ...) to
  // match the hostref/device index tie-break.
  std::vector<int32_t> f((size_t)n, 0);
  for (int32_t i = 1; i < n; ++i) {
    int32_t k = f[i - 1];
    while (k && T[i] != T[k]) k = f[k - 1];
    if (T[i] == T[k]) k++;
    f[i] = k;
  }
  int32_t p = n - f[n - 1];
  if (p < n && n % p == 0) {
    int32_t group = n / p;
    for (int32_t g = 0; g < p; ++g) {
      int32_t m = rot[(size_t)g * group] % p;
      for (int32_t j = 0; j < group; ++j)
        rot[(size_t)g * group + j] = m + j * p;
    }
  }

  int32_t key = 0;
  for (int32_t i = 0; i < n; ++i) {
    int32_t v = rot[i];
    last[i] = data[v == 0 ? n - 1 : v - 1];
    if (v == 0) key = i;
  }
  *key_out = key;
  return n;
}

extern "C" int64_t tpubz_mtf_rle2(const uint8_t* last, int64_t n,
                                  uint16_t* out, uint32_t* freqs,
                                  uint8_t* used) {
  std::memset(freqs, 0, 258 * sizeof(uint32_t));
  std::memset(used, 0, 256);
  for (int64_t i = 0; i < n; ++i) used[last[i]] = 1;
  uint8_t mtf[256];
  int32_t na = 0;
  for (int32_t c = 0; c < 256; ++c)
    if (used[c]) mtf[na++] = (uint8_t)c;
  uint16_t eob = (uint16_t)(na + 1);

  int64_t o = 0;
  int64_t zeros = 0;
  auto flush_zeros = [&]() {
    int64_t z = zeros - 1;
    for (;;) {
      uint16_t d = (uint16_t)(z & 1);
      out[o++] = d;
      freqs[d]++;
      if (z < 2) break;
      z = (z - 2) >> 1;
    }
    zeros = 0;
  };
  for (int64_t i = 0; i < n; ++i) {
    uint8_t b = last[i];
    if (mtf[0] == b) {
      zeros++;
      continue;
    }
    if (zeros) flush_zeros();
    // rank = position in the list (memchr), then one SIMD memmove shifts
    // ranks 0..r-1 down — beats the byte-rolling search loop
    int32_t r = (int32_t)((const uint8_t*)std::memchr(mtf, b, 256) - mtf);
    std::memmove(mtf + 1, mtf, (size_t)r);
    mtf[0] = b;
    out[o++] = (uint16_t)(r + 1);
    freqs[r + 1]++;
  }
  if (zeros) flush_zeros();
  out[o++] = eob;
  freqs[eob]++;
  return o;
}

// Fused entry: one GIL-free call per block for the threaded host engine.
extern "C" int64_t tpubz_block_transform(const uint8_t* data, int64_t n,
                                         uint16_t* rle2_out, uint32_t* freqs,
                                         uint8_t* used, int32_t* key_out) {
  std::vector<uint8_t> last(n > 0 ? (size_t)n : 1);
  if (tpubz_bwt(data, n, last.data(), key_out) < 0) return -1;
  return tpubz_mtf_rle2(last.data(), n, rle2_out, freqs, used);
}
