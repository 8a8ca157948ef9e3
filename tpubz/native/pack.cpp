// MSB-first bit packer — native engine.
//
// Sequential 64-bit-queue packer (semantics of the reference
// src/bitstream/bitpacker.rs:17-111 and of tpubz/hostref/bitio.py:pack_bits,
// which tests cross-check byte-for-byte). The numpy scatter formulation
// bottoms out in ufunc.at at ~1M fields/s; this runs at memory speed.
#include <cstdint>

extern "C" int64_t tpubz_pack_bits(const uint32_t* vals, const int64_t* bits,
                                   int64_t n, uint8_t* out,
                                   int64_t cap_bytes, int64_t* total_bits) {
  uint64_t acc = 0;
  int nacc = 0;
  int64_t nbytes = 0;
  int64_t total = 0;
  for (int64_t i = 0; i < n; i++) {
    const int b = (int)bits[i];
    if (b == 0) continue;
    acc = (acc << b) | (vals[i] & ((b >= 32) ? 0xFFFFFFFFu : ((1u << b) - 1)));
    nacc += b;
    total += b;
    while (nacc >= 8) {
      if (nbytes >= cap_bytes) return -1;
      out[nbytes++] = (uint8_t)(acc >> (nacc - 8));
      nacc -= 8;
    }
  }
  if (nacc > 0) {
    if (nbytes >= cap_bytes) return -1;
    out[nbytes++] = (uint8_t)(acc << (8 - nacc));
  }
  *total_bits = total;
  return nbytes;
}
