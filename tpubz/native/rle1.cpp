// RLE1 pre-pass + block splitting — native engine.
//
// Exact mirror of tpubz/hostref/rle1.py (rle1_encode + split_blocks):
// runs of 4..255 identical bytes -> 4 literals + count byte (run-4); longer
// runs re-scan greedily in 255-byte segments (reference src/tools/rle1.rs
// semantics). Block boundaries land on segment starts with post-RLE1 block
// size <= budget (reference src/compression/compress.rs:55), and each
// block's raw input range is reported for the pre-RLE1 CRC.
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {
constexpr int kRunThreshold = 4;
constexpr int kMaxRun = 255;

// true iff a run of >= 4 equal bytes starts at p (single u32 compare)
inline bool run4_at(const uint8_t* in, int64_t p) {
  uint32_t w;
  std::memcpy(&w, in + p, 4);
  return w == (uint32_t)in[p] * 0x01010101u;
}
}

// out cap must be >= n + n/254*1 + 8 (worst case 5 out per 4 in is wrong:
// worst case is 5 out per 255 in for runs, n out for literals; literals
// dominate: out <= n + 1 per 255-run; safe cap n + n/255 + 16).
// blocks: rows of (out_lo, out_hi, in_lo, in_hi), cap rows >= out_len/budget+2.
// Returns number of blocks; *out_len_p = total RLE1 output length.
extern "C" int64_t tpubz_rle1_split(const uint8_t* in, int64_t n,
                                    int64_t budget, uint8_t* out,
                                    int64_t* out_len_p, int64_t* blocks,
                                    int64_t blocks_cap) {
  int64_t out_len = 0;
  int64_t nblocks = 0;
  int64_t blk_out_lo = 0, blk_in_lo = 0;
  int64_t i = 0;

  auto close_block = [&](int64_t in_pos) {
    if (nblocks < blocks_cap) {
      blocks[nblocks * 4 + 0] = blk_out_lo;
      blocks[nblocks * 4 + 1] = out_len;
      blocks[nblocks * 4 + 2] = blk_in_lo;
      blocks[nblocks * 4 + 3] = in_pos;
    }
    nblocks++;
    blk_out_lo = out_len;
    blk_in_lo = in_pos;
  };

  while (i < n) {
    if (i + 3 < n && run4_at(in, i)) {
      // run of >= 4: greedy segments of up to kMaxRun
      const uint8_t b = in[i];
      int64_t j = i + 4;
      while (j < n && in[j] == b) j++;
      int64_t run = j - i;
      while (run > 0) {
        int64_t seg = std::min<int64_t>(run, kMaxRun);
        int64_t seg_out = (seg >= kRunThreshold) ? kRunThreshold + 1 : seg;
        if (out_len - blk_out_lo + seg_out > budget && out_len > blk_out_lo)
          close_block(i);
        if (seg >= kRunThreshold) {
          std::memset(out + out_len, b, kRunThreshold);
          out[out_len + kRunThreshold] = (uint8_t)(seg - kRunThreshold);
          out_len += kRunThreshold + 1;
        } else {
          std::memset(out + out_len, b, seg);
          out_len += seg;
        }
        run -= seg;
        i += seg;
      }
    } else {
      // literal stretch: scan to the next >=4 run start, bulk-copy in
      // budget-sized pieces, backing cuts up to same-byte run starts so
      // block boundaries never split a short (<4) run — identical cut
      // points to the segment-granular formulation.
      int64_t j = i + 1;
      while (j + 3 < n && !run4_at(in, j)) j++;
      if (j + 3 >= n) j = n;  // tail is all literals
      while (i < j) {
        int64_t remaining = budget - (out_len - blk_out_lo);
        if (remaining <= 0) {
          close_block(i);
          remaining = budget;
        }
        int64_t take = std::min(j - i, remaining);
        int64_t cut = i + take;
        if (cut < j) {
          // don't split a short same-byte run across blocks
          while (cut > i && in[cut - 1] == in[cut]) cut--;
          if (cut == i) {
            // the whole piece is one short run that doesn't fit the
            // remaining budget: close (if nonempty) and retry full-budget
            if (out_len > blk_out_lo) {
              close_block(i);
              continue;
            }
            cut = i + take;  // degenerate tiny budget: split anyway
          }
          take = cut - i;
        }
        std::memcpy(out + out_len, in + i, take);
        out_len += take;
        i += take;
      }
    }
  }
  if (out_len > blk_out_lo || nblocks == 0) {
    if (n > 0) {
      if (nblocks < blocks_cap) {
        blocks[nblocks * 4 + 0] = blk_out_lo;
        blocks[nblocks * 4 + 1] = out_len;
        blocks[nblocks * 4 + 2] = blk_in_lo;
        blocks[nblocks * 4 + 3] = n;
      }
      nblocks++;
    }
  }
  *out_len_p = out_len;
  return nblocks;
}
