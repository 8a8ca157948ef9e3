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
// (two-pointer least-rotation, O(n) time O(1) space): for the minimal
// rotation, suffix order equals rotation order — the same property the
// reference exploits (sais_fallback.rs:582-620), so the SA-IS input is n
// bytes, not the doubled 2n. Identical rotations exist only when the block
// is fully periodic (smallest period p divides n); suffix order puts each
// tie class {m, m+p, ...} shortest-suffix-first, which maps to an arbitrary
// S-index order after rotation — each class run is rewritten ascending
// (m, m+p, ...) in closed form, matching the hostref and device engines
// bit-for-bit (they break rank ties by index). Validated against the
// hostref oracle on 8.6k brute-force cases incl. all-periodic regimes.
//
// SA-IS memory-layout note: the induce passes read a RANDOM position j-1
// per SA entry, so the per-level string is stored FUSED as
// (value << 1) | S-type — one random cacheline touch per step instead of
// two (separate value + type arrays), u16 lanes at the top level. Equality
// of fused elements == equality of (value, type) pairs, which is exactly
// what the LMS-substring naming loop compares, so the fused form serves
// every consumer.
//
// MTF+RLE2: the serial scan with the roll-while-searching list update and
// bijective base-2 zero runs (semantics of src/tools/rle2_mtf.rs:23-177).

#include <cstdint>
#include <cstring>
#include <type_traits>
#include <vector>
#include <algorithm>
#ifdef __AVX2__
#include <immintrin.h>
#endif

// The SWAR fast paths (MTF head-word shift, ctz-based first-diff-byte) and
// the decode-side word tricks assume little-endian byte order. Failing the
// build here is graceful: tpubz/native/__init__.py falls back to the
// endian-neutral numpy mirrors when the lib doesn't compile.
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ != __ORDER_LITTLE_ENDIAN__
#error "tpubz native engine assumes a little-endian host"
#endif

// Optional per-phase accounting for tools/bwt_microbench.cpp — compiled
// out of the production .so (no TPUBZ_BWT_PROF in the build flags).
#ifdef TPUBZ_BWT_PROF
#include <chrono>
#include <cstdio>
namespace {
double g_prof[10];
inline double prof_now() {
  using namespace std::chrono;
  return duration<double, std::milli>(
             steady_clock::now().time_since_epoch())
      .count();
}
struct ProfScope {
  int slot;
  double t0;
  explicit ProfScope(int s) : slot(s), t0(prof_now()) {}
  ~ProfScope() { g_prof[slot] += prof_now() - t0; }
};
#define TPUBZ_PROF(slot) ProfScope _prof_scope_##__LINE__(slot)
}  // namespace
extern "C" void tpubz_bwt_prof_dump() {
  static const char* names[10] = {
      "least_rot", "build_sv", "fill+pass1", "induce1", "naming",
      "reduce",    "pass2",    "induce2",    "period",  "lastcol"};
  double tot = 0;
  for (int i = 0; i < 10; ++i) tot += g_prof[i];
  printf("bwt phase totals (all blocks x reps, recursion folded in):\n");
  for (int i = 0; i < 10; ++i)
    printf("  %-10s %8.1f ms (%4.1f%%)\n", names[i], g_prof[i],
           100.0 * g_prof[i] / tot);
}
#else
#define TPUBZ_PROF(slot) ((void)0)
#endif

namespace {

// Grow-only per-thread bump arena for the SA-IS per-level scratch (cnt,
// bkt, lms, name, sa1, sv1). Sized once before the recursion (total need
// is < 6n+O(1) ints — each level allocates <= 2K + 2*n_l + 1 ints and
// n_l <= n/2^l), so pointers stay stable across nested alloc calls.
// Memory is handed out DIRTY: every consumer below either writes each
// slot before reading it or zeroes explicitly — this removes ~4-6 MB of
// per-block fill traffic (the old std::vector zero/-1 inits) plus the
// alloc/free churn of the recursion.
struct Arena {
  std::vector<int32_t> buf;
  size_t top = 0;
  void prepare(size_t total) {
    if (buf.size() < total) buf.resize(total);
    top = 0;
  }
  int32_t* alloc(size_t k) {
    // growing here would invalidate live pointers up the recursion —
    // prepare() must have sized the arena; fail loudly over silent UB
    if (top + k > buf.size()) std::abort();
    int32_t* p = buf.data() + top;
    top += k;
    return p;
  }
  // 8-byte-aligned variant (the LMS bitmap is accessed as u64 words; the
  // vector's base is allocator-aligned, so an even int32 offset suffices)
  int32_t* alloc8(size_t k) {
    top = (top + 1) & ~(size_t)1;
    return alloc(k + (k & 1));
  }
  void release(size_t k) { top -= k; }
};

// Type bits (LSBs) of 64 consecutive fused elements packed into one u64
// (bit k = stype of p[k]) — feeds the word-wise LMS scan in pass 1.
#ifdef __AVX512BW__
inline uint64_t ty_bits64(const uint16_t* p) {
  const __m512i one = _mm512_set1_epi16(1);
  uint64_t lo = (uint32_t)_mm512_test_epi16_mask(_mm512_loadu_si512(p), one);
  uint64_t hi =
      (uint32_t)_mm512_test_epi16_mask(_mm512_loadu_si512(p + 32), one);
  return lo | (hi << 32);
}
inline uint64_t ty_bits64(const int32_t* p) {
  const __m512i one = _mm512_set1_epi32(1);
  uint64_t b0 = (uint16_t)_mm512_test_epi32_mask(_mm512_loadu_si512(p), one);
  uint64_t b1 =
      (uint16_t)_mm512_test_epi32_mask(_mm512_loadu_si512(p + 16), one);
  uint64_t b2 =
      (uint16_t)_mm512_test_epi32_mask(_mm512_loadu_si512(p + 32), one);
  uint64_t b3 =
      (uint16_t)_mm512_test_epi32_mask(_mm512_loadu_si512(p + 48), one);
  return b0 | (b1 << 16) | (b2 << 32) | (b3 << 48);
}
#else
// SWAR: gather lane LSBs to the top nibble/pair via one multiply per u64
inline uint64_t ty_bits64(const uint16_t* p) {
  constexpr uint64_t M = 0x0001000100010001ull;
  constexpr uint64_t K =
      (1ull << 48) | (1ull << 33) | (1ull << 18) | (1ull << 3);
  uint64_t out = 0;
  for (int g = 0; g < 16; ++g) {
    uint64_t w;
    std::memcpy(&w, p + 4 * g, 8);
    out |= (((w & M) * K) >> 48 & 0xF) << (4 * g);
  }
  return out;
}
inline uint64_t ty_bits64(const int32_t* p) {
  constexpr uint64_t M = 0x0000000100000001ull;
  constexpr uint64_t K = (1ull << 62) | (1ull << 31);
  uint64_t out = 0;
  for (int g = 0; g < 32; ++g) {
    uint64_t w;
    std::memcpy(&w, p + 2 * g, 8);
    out |= (((w & M) * K) >> 62 & 0x3) << (2 * g);
  }
  return out;
}
#endif

// SA-IS over a FUSED string sv[0..n): sv[i] = (value << 1) | stype, values
// in [0, K); position n-1 must hold the unique smallest value (sentinel,
// S-type by convention => sv[n-1] == 1). Fills sa[0..n).
template <typename FusedT>
void sais_fused(const FusedT* sv, int32_t* sa, int32_t n, int32_t K,
                Arena& ar) {
  if (n == 1) {
    sa[0] = 0;
    return;
  }
  auto is_lms = [&](int32_t i) {
    return i > 0 && (sv[i] & 1) && !(sv[i - 1] & 1);
  };

  size_t ar_mark = ar.top;
  int32_t* cnt = ar.alloc(K);
  int32_t* bkt = ar.alloc(K);  // fully written by bkt_heads/tails
  std::memset(cnt, 0, (size_t)K * sizeof(int32_t));
  for (int32_t i = 0; i < n; ++i) cnt[sv[i] >> 1]++;
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

  // The induce scans are latency-bound on the random sv[j-1] read (j jumps
  // with suffix order); sa itself is read sequentially, so the upcoming
  // read targets are known PD iterations early — prefetch them. Entries
  // not yet induced read as -1 at prefetch time (harmless no-op hint).
#ifndef TPUBZ_INDUCE_PD
#define TPUBZ_INDUCE_PD 24
#endif
  constexpr int32_t PD = TPUBZ_INDUCE_PD;
  auto induce = [&]() {
    bkt_heads();
    for (int32_t i = 0; i < n; ++i) {
      if (i + PD < n) {
        int32_t jp = sa[i + PD];
        if (jp > 0) __builtin_prefetch(&sv[jp - 1]);
      }
      int32_t j = sa[i];
      if (j > 0) {
        FusedT v = sv[j - 1];  // ONE random read: value + type together
        if (!(v & 1)) sa[bkt[v >> 1]++] = j - 1;
      }
    }
    bkt_tails();
    for (int32_t i = n - 1; i >= 0; --i) {
      if (i - PD >= 0) {
        int32_t jp = sa[i - PD];
        if (jp > 0) __builtin_prefetch(&sv[jp - 1]);
      }
      int32_t j = sa[i];
      if (j > 0) {
        FusedT v = sv[j - 1];
        if (v & 1) sa[--bkt[v >> 1]] = j - 1;
      }
    }
  };

  // pass 1: LMS suffixes at bucket tails (any order), induce to sort the
  // LMS *substrings*; the same right-to-left scan collects the LMS
  // positions (filled from the end so `lms` ends up in ascending index
  // order without a second pass over sv)
  int32_t lms_cap = n / 2 + 1;
  int32_t* lms_buf = ar.alloc(lms_cap);
  // Per-LMS substring length (next LMS pos - this one; sentinel gets 0),
  // indexed pos>>1 like name[] (LMS positions are never adjacent), plus a
  // 1-bit-per-position LMS bitmap: the naming loop tests LMS-ness for all
  // n SA entries, and the bitmap (n/8 bytes, L1/L2-resident) makes that a
  // cheap hit instead of a random sv[cur-1..cur] read into the full string.
  int32_t* plen = ar.alloc(lms_cap);
  int32_t nbw = n / 64 + 1;  // u64 words
  uint64_t* lmsbit = reinterpret_cast<uint64_t*>(ar.alloc8(2 * nbw));
  int32_t m = 0;
  {
    TPUBZ_PROF(2);
    std::fill(sa, sa + n, -1);
    bkt_tails();
    // Word-wise LMS scan: lms-mask = ty & ~(ty<<1 | carry) over 64
    // positions at a time (carry = type of the word's predecessor;
    // seeded 1 so position 0 can never be LMS), with scalar work only on
    // actual hits. The mask word IS the bitmap the naming loop probes,
    // so it is stored as computed — no separate memset/bit-set pass.
    int32_t nw = n >> 6;
    int32_t prev_pos = -1;
    uint64_t carry = 1;
    for (int32_t w = 0; w < nw; ++w) {
      uint64_t ty = ty_bits64(sv + ((int64_t)w << 6));
      uint64_t lm = ty & ~((ty << 1) | carry);
      carry = ty >> 63;
      lmsbit[w] = lm;
      int32_t base = w << 6;
      while (lm) {
        int32_t pos = base + (int32_t)__builtin_ctzll(lm);
        lm &= lm - 1;
        sa[--bkt[sv[pos] >> 1]] = pos;
        lms_buf[m++] = pos;
        if (prev_pos >= 0) plen[prev_pos >> 1] = pos - prev_pos;
        prev_pos = pos;
      }
    }
    uint64_t tail_lms = 0;
    uint64_t prev_ty = carry;
    for (int32_t i = nw << 6; i < n; ++i) {
      uint64_t t_ = sv[i] & 1;
      if (t_ && !prev_ty) {
        tail_lms |= 1ull << (i & 63);
        sa[--bkt[sv[i] >> 1]] = i;
        lms_buf[m++] = i;
        if (prev_pos >= 0) plen[prev_pos >> 1] = i - prev_pos;
        prev_pos = i;
      }
      prev_ty = t_;
    }
    if (n & 63) lmsbit[nw] = tail_lms;
    if (prev_pos >= 0) plen[prev_pos >> 1] = 0;  // sentinel, always last LMS
  }
  const int32_t* lms = lms_buf;  // LMS positions in index order
  {
    TPUBZ_PROF(3);
    induce();
  }

  // name LMS substrings in their sorted order. Two LMS positions are never
  // adjacent (an LMS needs an L directly before it), so name[] indexed by
  // cur/2 is collision-free at half the footprint. Dirty memory is fine:
  // every slot read (lms[k]>>1) is written first — after pass 1 the SA
  // holds all n positions, so the loop visits every LMS.
  //
  // Substring compare: the old per-symbol loop (sv read + two is_lms
  // probes per step) is replaced by a length test + flat memcmp — two LMS
  // substrings are equal iff their lengths match AND the fused words over
  // [0, len] match (a length mismatch always means "differ": either a
  // fused word differs before min(len), or the shorter one's end flag
  // fires alone). The end symbol IS included in the compare (d == len),
  // exactly like the old loop which compared sv before checking ends.
  int32_t* name = ar.alloc(n / 2 + 1);
  int32_t names = 0;
  int32_t prev = -1;
  {
    TPUBZ_PROF(4);
    // inline word compare instead of libc memcmp: typical LMS substrings
    // are <= 4 symbols, so the whole compare is ONE masked u64 load pair
    // (sv buffers are allocated with >= 4 elements of tail padding to make
    // the unconditional 8-byte loads safe)
    int32_t lp = 0;
    for (int32_t i = 0; i < n; ++i) {
      int32_t cur = sa[i];
      if (!((lmsbit[(uint32_t)cur >> 6] >> (cur & 63)) & 1)) continue;
      int32_t lc = plen[cur >> 1];
      bool differ;
      if (prev < 0 || lp != lc) {
        differ = true;
      } else {
        const char* a = reinterpret_cast<const char*>(sv + prev);
        const char* b = reinterpret_cast<const char*>(sv + cur);
        size_t bytes = ((size_t)lc + 1) * sizeof(FusedT);
        uint64_t wa, wb;
        std::memcpy(&wa, a, 8);
        std::memcpy(&wb, b, 8);
        if (bytes <= 8) {
          uint64_t diff = wa ^ wb;
          differ = bytes == 8
                       ? diff != 0
                       : (diff & ((1ull << (8 * bytes)) - 1)) != 0;
        } else {
          differ = wa != wb;
          size_t d = 8;
          for (; !differ && d + 8 <= bytes; d += 8) {
            std::memcpy(&wa, a + d, 8);
            std::memcpy(&wb, b + d, 8);
            differ = wa != wb;
          }
          if (!differ && d < bytes) {
            std::memcpy(&wa, a + d, 8);
            std::memcpy(&wb, b + d, 8);
            differ = ((wa ^ wb) & ((1ull << (8 * (bytes - d))) - 1)) != 0;
          }
        }
      }
      if (differ) names++;
      name[cur >> 1] = names - 1;
      prev = cur;
      lp = lc;
    }
  }

  // reduced problem: names in LMS index order (ends with the sentinel's
  // unique smallest name, so the precondition holds recursively). The
  // reduced string is built directly in fused form. Both sa1 and sv1 are
  // fully written before any read (recursion fills sa1[0..m); the
  // names==m branch writes through the bijective name map), so dirty
  // arena memory is safe.
  int32_t* sa1 = ar.alloc(m);
  if (names < m) {
    // the reduced string reuses the fused-u16 trick whenever the names fit
    // ((name<<1)|ty <= 65535): half the random-read traffic in the
    // recursion's induce scans, exactly like the top level
    auto build_and_recurse = [&](auto* sv1) {
      using T1 = std::remove_reference_t<decltype(*sv1)>;
      {
        TPUBZ_PROF(5);
        int32_t nv = name[lms[m - 1] >> 1];  // sentinel name
        uint8_t ty = 1;
        sv1[m - 1] = (T1)((nv << 1) | 1);
        for (int32_t k = m - 2; k >= 0; --k) {
          int32_t v = name[lms[k] >> 1];
          ty = (v < nv) || (v == nv && ty);
          sv1[k] = (T1)((v << 1) | ty);
          nv = v;
        }
      }
      sais_fused<T1>(sv1, sa1, m, names, ar);
    };
    // +4 int32 tail padding on every fused buffer: the naming loop's
    // unconditional 8-byte compare loads may overread past the sentinel
    if (names < (1 << 15)) {
      int32_t* raw = ar.alloc((m + 1) / 2 + 4);
      build_and_recurse(reinterpret_cast<uint16_t*>(raw));
      ar.release((m + 1) / 2 + 4);
    } else {
      int32_t* sv1 = ar.alloc(m + 4);
      build_and_recurse(sv1);
      ar.release(m + 4);
    }
  } else {
    for (int32_t k = 0; k < m; ++k) sa1[name[lms[k] >> 1]] = k;
  }

  // pass 2: LMS suffixes at bucket tails in their true sorted order, induce
  {
    TPUBZ_PROF(6);
    std::fill(sa, sa + n, -1);
    bkt_tails();
    for (int32_t k = m - 1; k >= 0; --k) {
      int32_t j = lms[sa1[k]];
      sa[--bkt[sv[j] >> 1]] = j;
    }
  }
  {
    TPUBZ_PROF(7);
    induce();
  }
  ar.top = ar_mark;  // pop this level's scratch
}

// Per-thread scratch reused across blocks: the top-level arrays total
// ~6.5 MB per 900k block, and fresh vector allocations would pay mmap
// page faults + kernel zeroing on every call (the block pools are
// long-lived threads, so the arrays are hot after the first block).
thread_local std::vector<uint8_t> tl_T;
thread_local std::vector<uint16_t> tl_sv;
thread_local std::vector<int32_t> tl_sa;
thread_local Arena tl_arena;

// Suffix array of a byte string (values shifted +1, sentinel appended,
// fused u16 lanes: 4x less random-read traffic than int32 value+type).
// Returns a pointer into thread-local scratch, valid until the next call
// on this thread: entry i is the start of the i-th smallest suffix.
const int32_t* sais_u8(const uint8_t* t, int32_t n) {
  int32_t N = n + 1;
  // +8 u16 tail padding for the naming loop's 8-byte compare overreads
  if ((int32_t)tl_sv.size() < N + 8) tl_sv.resize(N + 8);
  uint16_t* sv = tl_sv.data();
  {
    TPUBZ_PROF(1);
    sv[n] = 1;  // sentinel: value 0, S-type
    int32_t nv = 0;
    uint8_t ty = 1;
    for (int32_t i = n - 1; i >= 0; --i) {
      int32_t v = (int32_t)t[i] + 1;
      ty = (v < nv) || (v == nv && ty);
      sv[i] = (uint16_t)((v << 1) | ty);
      nv = v;
    }
  }
  if ((int32_t)tl_sa.size() < N) tl_sa.resize(N);
  // per-level simultaneous scratch is <= 2K + 2.6n_l + O(1) ints (lms,
  // plen, name at n_l/2+1 each, bitmap n_l/32, sa1+sv1 <= n_l) with
  // n_{l+1} <= n_l/2, so 10N+8192 bounds the whole recursion
  tl_arena.prepare((size_t)N * 10 + 8192);
  sais_fused<uint16_t>(sv, tl_sa.data(), N, 257, tl_arena);
  return tl_sa.data() + 1;  // drop the sentinel's slot 0
}

// Start index of the lexicographically minimal rotation: the classic
// two-pointer "minimum expression" duel, O(n) time, O(1) space (the
// reference reaches the same rotation via Duval factorization,
// sais_fallback.rs:781-816).
int32_t least_rotation(const uint8_t* s, int32_t n) {
  int32_t i = 0, j = 1, k = 0;
  while (i < n && j < n && k < n) {
    int32_t ik = i + k, jk = j + k;
    if (ik >= n) ik -= n;
    if (jk >= n) jk -= n;
#ifdef __AVX2__
    // bulk-advance over the equal prefix, but only once the scalar duel
    // has already matched 16 bytes (long-match regime): on high-entropy
    // data most duels mismatch on byte 0 and the wide loads would cost
    // more than they save (measured 3.7x slower unconditionally)
    while (k >= 16 && k + 32 <= n && ik + 32 <= n && jk + 32 <= n) {
      __m256i a = _mm256_loadu_si256((const __m256i*)(s + ik));
      __m256i b = _mm256_loadu_si256((const __m256i*)(s + jk));
      uint32_t ne =
          ~(uint32_t)_mm256_movemask_epi8(_mm256_cmpeq_epi8(a, b));
      if (ne) {
        int32_t adv = (int32_t)__builtin_ctz(ne);
        k += adv;
        ik += adv;
        jk += adv;
        goto compare_one;
      }
      k += 32;
      ik += 32;
      jk += 32;
    }
    if (k >= n) break;
    // a bulk advance can run a cursor exactly to n — wrap before the
    // scalar compare (the original loop recomputed ik/jk mod n each step)
    if (ik >= n) ik -= n;
    if (jk >= n) jk -= n;
#endif
  compare_one:
    int32_t d = (int32_t)s[ik] - (int32_t)s[jk];
    if (d == 0) {
      ++k;
      continue;
    }
    if (d > 0)
      i += k + 1;
    else
      j += k + 1;
    if (i == j) ++j;
    k = 0;
  }
  return i < j ? i : j;
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
  int32_t r;
  {
    TPUBZ_PROF(0);
    r = least_rotation(data, n);
  }
  if ((int32_t)tl_T.size() < n) tl_T.resize(n);
  uint8_t* T = tl_T.data();
  std::memcpy(T, data + r, (size_t)(n - r));
  std::memcpy(T + (n - r), data, (size_t)r);
  const int32_t* sa = sais_u8(T, n);

  // smallest period of T dividing n; identical rotations exist iff p < n
  // ("has a period dividing n" is rotation-invariant). Periods dividing n
  // are gcd-closed (Fine–Wilf: two proper ones sum to <= n), so the
  // minimum divides every other and greedy division by n's prime factors
  // reaches it — each candidate is one memcmp that exits on the first
  // mismatch, so the non-periodic common case costs a few bytes per prime
  // (the KMP failure function this replaces built a 4n-byte table).
  // Tie classes are consecutive runs of n/p entries, all congruent mod p
  // in S-space; rewrite each ascending (m, m+p, ...) to match the
  // hostref/device index tie-break.
  auto is_period = [&](int32_t q) {
    return std::memcmp(T, T + q, (size_t)(n - q)) == 0;
  };
  int32_t p = n;
  {
    TPUBZ_PROF(8);
    int32_t rem = n;
    for (int32_t q = 2; (int64_t)q * q <= rem; ++q) {
      while (rem % q == 0) {
        rem /= q;
        if (p % q == 0 && is_period(p / q)) p /= q;
      }
    }
    if (rem > 1 && p % rem == 0 && is_period(p / rem)) p /= rem;
  }

  // BWT last column directly from T (no rot array): S-rotation
  // (sa[i]+r) mod n and T-rotation sa[i] are the same string, so the byte
  // before it is last[i] = T[(sa[i]-1) mod n]. Within a periodic tie
  // class all members are identical rotations, so `last` needs no tie
  // rewrite (T's cyclic period p makes T[(x-1) mod n] constant on the
  // class). key = sorted position of S's rotation 0 = T-rotation
  // (n-r) mod n, folded into the same pass.
  int32_t target = r == 0 ? 0 : n - r;
  int32_t key = 0;
  {
    TPUBZ_PROF(9);
    constexpr int32_t PD = 24;  // sa is sequential; the T[sa[i]-1] read is
                                // random — prefetch it PD entries ahead
    for (int32_t i = 0; i < n; ++i) {
      if (i + PD < n) __builtin_prefetch(&T[sa[i + PD] - 1]);
      int32_t v = sa[i];
      last[i] = T[v == 0 ? n - 1 : v - 1];
      if (v == target) key = i;
    }
  }
  if (p < n) {
    // ascending (m, m+p, ...) tie rewrite puts rotation 0 — class m == 0,
    // smallest member — at the FIRST slot of its n/p-wide class run
    int32_t group = n / p;
    key = key / group * group;
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
  uint8_t mtf[264];  // 8 spare bytes so the widest 32-lane search load
                     // (offset 232) stays in bounds; lanes past 255 sit
                     // after the guaranteed hit and can never match first
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
  constexpr uint64_t ONES = 0x0101010101010101ull;
  constexpr uint64_t HIGH = 0x8080808080808080ull;
  int64_t i = 0;
#if defined(__AVX512VBMI__) && defined(__AVX512BW__)
  // Register-resident list head: ranks are MTF-local, so the first 64
  // list entries stay in ONE zmm register across symbols — find is a
  // single cmpeq-mask, the update is a cross-lane vpermb byte shift plus
  // a blend, and NO memory round-trips on the hot path (a masked-store/
  // wide-load version stalled on failed store-forwarding every symbol;
  // measured no better than scalar). Memory bytes 64..255 are only
  // touched on the rare rank>=64 fallback, which syncs the register in
  // and out around a memmove.
  {
    const __m512i shift_idx =
        _mm512_set_epi64(0x3e3d3c3b3a393837ull, 0x363534333231302full,
                         0x2e2d2c2b2a292827ull, 0x262524232221201full,
                         0x1e1d1c1b1a191817ull, 0x161514131211100full,
                         0x0e0d0c0b0a090807ull, 0x0605040302010000ull);
    __m512i zhead = _mm512_loadu_si512(mtf);
    uint8_t head0 = mtf[0];  // scalar mirror of list entry 0
    while (i < n) {
      uint8_t b = last[i];
      if (head0 == b) {
        // zero run: consume the whole run of the current head byte
        int64_t j = i + 1;
        uint64_t pat = (uint64_t)b * ONES;
        while (j + 8 <= n) {
          uint64_t w;
          std::memcpy(&w, last + j, 8);
          uint64_t x = w ^ pat;
          if (x) {
            j += (int64_t)(__builtin_ctzll(x) >> 3);
            goto zrun_end;
          }
          j += 8;
        }
        while (j < n && last[j] == b) ++j;
      zrun_end:
        zeros += j - i;
        i = j;
        continue;
      }
      if (zeros) flush_zeros();
      {
        const __m512i vb = _mm512_set1_epi8((char)b);
        uint64_t m0 = _mm512_cmpeq_epi8_mask(zhead, vb);
        int32_t r;
        if (m0) {
          r = (int32_t)__builtin_ctzll(m0);
          // bytes 0..r take [b, old 0..r-1]; bytes r+1..63 keep their old
          // entries (only the prefix up to the hit rotates)
          __m512i sh = _mm512_mask_mov_epi8(
              _mm512_permutexvar_epi8(shift_idx, zhead), 1, vb);
          zhead = _mm512_mask_mov_epi8(zhead,
                                       _bzhi_u64(~0ull, (uint32_t)r + 1), sh);
        } else {
          _mm512_storeu_si512(mtf, zhead);
          for (int32_t off = 64;; off += 64) {
            uint64_t m = _mm512_cmpeq_epi8_mask(
                _mm512_loadu_si512(mtf + off), vb);
            if (m) {
              r = off + (int32_t)__builtin_ctzll(m);
              break;
            }
          }
          std::memmove(mtf + 1, mtf, (size_t)r);
          mtf[0] = b;
          zhead = _mm512_loadu_si512(mtf);
        }
        head0 = b;
        out[o++] = (uint16_t)(r + 1);
        freqs[r + 1]++;
      }
      ++i;
    }
  }
#else
  // SWAR over the 256-byte MTF list and the input: find-byte and run-scan
  // eight lanes per step with no per-symbol libc call overhead.
  while (i < n) {
    uint8_t b = last[i];
    if (mtf[0] == b) {
      // zero run: consume the whole run of the current head byte at once
      int64_t j = i + 1;
      uint64_t pat = (uint64_t)b * ONES;
      while (j + 8 <= n) {
        uint64_t w;
        std::memcpy(&w, last + j, 8);
        uint64_t x = w ^ pat;
        if (x) {
          j += (int64_t)(__builtin_ctzll(x) >> 3);
          goto run_end;
        }
        j += 8;
      }
      while (j < n && last[j] == b) ++j;
    run_end:
      zeros += j - i;
      i = j;
      continue;
    }
    if (zeros) flush_zeros();
    {
      int32_t r;
      // rank = position in the list: find-byte over the 256-byte list.
      // First 8 entries via one SWAR word (most ranks are tiny — MTF
      // locality), then 32-lane AVX2 sweeps for the high-entropy tail.
      uint64_t w0;
      std::memcpy(&w0, mtf, 8);
      uint64_t x0 = w0 ^ ((uint64_t)b * ONES);
      uint64_t m0 = (x0 - ONES) & ~x0 & HIGH;
      if (m0) {
        r = (int32_t)(__builtin_ctzll(m0) >> 3);
      } else {
#ifdef __AVX2__
        const __m256i vb = _mm256_set1_epi8((char)b);
        for (int32_t off = 8;; off += 32) {
          // the list is 256 bytes; off 8..232 reads stay in bounds via the
          // 264-byte backing array (tail lanes beyond 256 never match
          // before the guaranteed hit)
          __m256i v = _mm256_loadu_si256((const __m256i*)(mtf + off));
          uint32_t mm = (uint32_t)_mm256_movemask_epi8(
              _mm256_cmpeq_epi8(v, vb));
          if (mm) {
            r = off + (int32_t)__builtin_ctz(mm);
            break;
          }
        }
#else
        uint64_t pat = (uint64_t)b * ONES;
        r = 0;
        for (int32_t off = 8;; off += 8) {
          uint64_t w;
          std::memcpy(&w, mtf + off, 8);
          uint64_t x = w ^ pat;
          uint64_t m = (x - ONES) & ~x & HIGH;
          if (m) {
            r = off + (int32_t)(__builtin_ctzll(m) >> 3);
            break;
          }
        }
#endif
      }
      if (r < 8) {
        // in-register shift of the head word: bytes 1..r get old 0..r-1
        uint64_t w;
        std::memcpy(&w, mtf, 8);
        uint64_t repl = (w << 8) | b;
        if (r < 7) {
          uint64_t keep = ~0ull << (8 * (r + 1));
          repl = (repl & ~keep) | (w & keep);
        }
        std::memcpy(mtf, &repl, 8);
      } else {
        std::memmove(mtf + 1, mtf, (size_t)r);
        mtf[0] = b;
      }
      out[o++] = (uint16_t)(r + 1);
      freqs[r + 1]++;
    }
    ++i;
  }
#endif
  if (zeros) flush_zeros();
  out[o++] = eob;
  freqs[eob]++;
  return o;
}

// Fused entry: one GIL-free call per block for the threaded host engine.
extern "C" int64_t tpubz_block_transform(const uint8_t* data, int64_t n,
                                         uint16_t* rle2_out, uint32_t* freqs,
                                         uint8_t* used, int32_t* key_out) {
  thread_local std::vector<uint8_t> tl_last;
  if ((int64_t)tl_last.size() < (n > 0 ? n : 1))
    tl_last.resize(n > 0 ? (size_t)n : 1);
  if (tpubz_bwt(data, n, tl_last.data(), key_out) < 0) return -1;
  return tpubz_mtf_rle2(tl_last.data(), n, rle2_out, freqs, used);
}
