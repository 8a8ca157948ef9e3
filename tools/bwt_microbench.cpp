// Standalone microbench for the native CPU block transform (bwt.cpp).
//
// The shared VM's timing swings 2-3x between phases, so the Python-side
// medians are hard to compare across code changes; this bench times each
// stage per block over many repetitions and reports the MINIMUM (the
// noise-robust statistic for optimization work — the min is the run that
// hit no interference).
//
// Build/run (from repo root):
//   g++ -O3 -march=native -std=c++17 -DTPUBZ_BWT_PROF tools/bwt_microbench.cpp \
//       tpubz/native/refine.cpp -o /tmp/bwt_microbench
//   /tmp/bwt_microbench /tmp/bwtbench [reps]
// (expects NN.bin block dumps produced by the companion Python snippet)

#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "../tpubz/native/bwt.cpp"

extern "C" int64_t tpubz_refine_stream(const uint16_t*, int64_t, int32_t,
                                       int32_t, int32_t*, int32_t*, int32_t*);

static double now_ms() {
  using namespace std::chrono;
  return duration<double, std::milli>(steady_clock::now().time_since_epoch())
      .count();
}

int main(int argc, char** argv) {
  std::string dir = argc > 1 ? argv[1] : "/tmp/bwtbench";
  int reps = argc > 2 ? atoi(argv[2]) : 7;

  std::vector<std::vector<uint8_t>> blocks;
  for (int k = 0;; ++k) {
    char path[256];
    snprintf(path, sizeof path, "%s/%02d.bin", dir.c_str(), k);
    FILE* f = fopen(path, "rb");
    if (!f) break;
    fseek(f, 0, SEEK_END);
    long sz = ftell(f);
    fseek(f, 0, SEEK_SET);
    std::vector<uint8_t> b(sz);
    if (fread(b.data(), 1, sz, f) != (size_t)sz) return 1;
    fclose(f);
    blocks.push_back(std::move(b));
  }
  if (blocks.empty()) {
    fprintf(stderr, "no blocks in %s\n", dir.c_str());
    return 1;
  }

  std::vector<uint8_t> last(1000000);
  std::vector<uint16_t> rle2(2000000);
  std::vector<uint32_t> freqs(258);
  std::vector<uint8_t> used(256);
  std::vector<int32_t> sel(40000), lens(6 * 258);
  int32_t table_count, key;

  double sum_bwt = 0, sum_mtf = 0, sum_ref = 0;
  int64_t sum_bytes = 0;
  for (size_t k = 0; k < blocks.size(); ++k) {
    auto& b = blocks[k];
    double best_bwt = 1e30, best_mtf = 1e30, best_ref = 1e30;
    int64_t rlen = 0;
    for (int r = 0; r < reps; ++r) {
      double t0 = now_ms();
      tpubz_bwt(b.data(), (int64_t)b.size(), last.data(), &key);
      double t1 = now_ms();
      rlen = tpubz_mtf_rle2(last.data(), (int64_t)b.size(), rle2.data(),
                            freqs.data(), used.data());
      double t2 = now_ms();
      int32_t na = 0;
      for (int c = 0; c < 256; ++c) na += used[c];
      tpubz_refine_stream(rle2.data(), rlen, na + 2, 8, sel.data(),
                          lens.data(), &table_count);
      double t3 = now_ms();
      if (t1 - t0 < best_bwt) best_bwt = t1 - t0;
      if (t2 - t1 < best_mtf) best_mtf = t2 - t1;
      if (t3 - t2 < best_ref) best_ref = t3 - t2;
    }
    printf("block %zu (%7zu B): bwt %6.1f  mtf %5.1f  refine %5.1f  (min of %d)\n",
           k, b.size(), best_bwt, best_mtf, best_ref, reps);
    sum_bwt += best_bwt;
    sum_mtf += best_mtf;
    sum_ref += best_ref;
    sum_bytes += (int64_t)b.size();
  }
  double tot = sum_bwt + sum_mtf + sum_ref;
  printf("MEAN/block: bwt %.1f  mtf %.1f  refine %.1f  total %.1f ms  -> %.1f MB/s/thread\n",
         sum_bwt / blocks.size(), sum_mtf / blocks.size(),
         sum_ref / blocks.size(), tot / blocks.size(),
         (double)sum_bytes / 1e3 / tot);
#ifdef TPUBZ_BWT_PROF
  tpubz_bwt_prof_dump();
#endif
  return 0;
}
