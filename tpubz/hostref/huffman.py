"""Multi-table canonical Huffman coding, host reference.

Encoder semantics mirror reference src/huffman_coding/huffman.rs:
  - 2..6 tables by RLE2 length (huffman.rs:87-93)
  - init_tables: frequency-portion partitioning assigning 0/15 weights,
    with the "just shy of the limit" special case for table indices 2 and 4
    (huffman.rs:472-532)
  - 4 refinement iterations: per-50-symbol-chunk min-cost table selection,
    per-table frequency re-accumulation, and code-length rebuild from a real
    Huffman tree with a 17-bit cap + weight-flattening retry
    (huffman.rs:114-200, huffman_code_from_weights.rs:17-109)
  - emission order: symbol map, 3-bit table count, 15-bit selector count,
    MTF'd selectors unary-coded, per-table 5-bit origin + {10,11}*0 deltas,
    canonical codes ascending by (len, sym), payload per 50-chunk selector
    (huffman.rs:207-466)

Decoder accepts the full format envelope (code lengths up to 20, selector
count clamp at level*100_000/50) per src/compression/decompress.rs:140-359.
"""
from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger("tpubz")

from ..format.constants import (
    GROUP_SIZE,
    huffman_iters,
    MAX_CODE_LEN_DECODE,
    MAX_CODE_LEN_ENCODE,
    group_count_for,
)
from ..format.symbol_map import encode_symbol_map
from .bitio import BitAccum, BitReader


# ---------------------------------------------------------------------------
# code-length construction
# ---------------------------------------------------------------------------

def code_lengths_from_freqs(freqs: np.ndarray, alpha: int, max_len: int = MAX_CODE_LEN_ENCODE) -> np.ndarray:
    """Build depth-limited Huffman code lengths for symbols 0..alpha-1.

    Julian-style: weights carry (weight<<8 | depth); merged weight =
    sum of weights with depth = max+1 (huffman_code_from_weights.rs:105-109).
    On depth overflow, flatten weights w -> (w//2 + 1) and retry
    (huffman_code_from_weights.rs:74-82).
    """
    w = np.asarray(freqs[:alpha], dtype=np.int64)
    weight = np.where(w == 0, 1, w)
    while True:
        lens = _tree_depths(weight)
        if lens.max() <= max_len:
            return lens
        weight = weight // 2 + 1


def _tree_depths(weight: np.ndarray) -> np.ndarray:
    """Huffman tree build returning leaf depths. weight: int64[alpha] >= 1."""
    alpha = weight.size
    if alpha == 1:
        return np.array([1], dtype=np.int64)
    # node = (packed weight, id); packed = weight<<8 | depth for tie behavior
    import heapq

    heap = [((int(wi) << 8), i) for i, wi in enumerate(weight)]
    heapq.heapify(heap)
    parent = np.full(2 * alpha, -1, dtype=np.int64)
    next_id = alpha
    while len(heap) > 1:
        w1, n1 = heapq.heappop(heap)
        w2, n2 = heapq.heappop(heap)
        packed = ((w1 & ~0xFF) + (w2 & ~0xFF)) | (1 + max(w1 & 0xFF, w2 & 0xFF))
        parent[n1] = next_id
        parent[n2] = next_id
        heapq.heappush(heap, (packed, next_id))
        next_id += 1
    depths = np.zeros(alpha, dtype=np.int64)
    for i in range(alpha):
        d = 0
        j = i
        while parent[j] >= 0:
            j = parent[j]
            d += 1
        depths[i] = d
    return depths


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Assign canonical codes ascending by (length, symbol) (huffman.rs:340-374)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    alpha = lengths.size
    order = np.lexsort((np.arange(alpha), lengths))
    codes = np.zeros(alpha, dtype=np.int64)
    code = 0
    prev_len = int(lengths[order[0]])
    for s in order:
        l = int(lengths[s])
        if l != prev_len:
            code <<= l - prev_len
            prev_len = l
        codes[s] = code
        code += 1
    return codes


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def c_code_lengths(freqs: np.ndarray, alpha: int, max_len: int = MAX_CODE_LEN_ENCODE) -> np.ndarray:
    """Exact C-bzip2 BZ2_hbMakeCodeLengths: binary heap with packed
    (weight<<8|depth) ordering and weight-flattening retry. Matching the heap
    mechanics exactly reproduces C bzip2's tie-breaking, which pins our
    compressed size to the C encoder's on identical inputs."""
    freqs = np.asarray(freqs[:alpha], dtype=np.int64)
    weight = np.zeros(alpha * 2 + 2, dtype=np.int64)
    heap = np.zeros(alpha + 2, dtype=np.int64)
    parent = np.zeros(alpha * 2 + 2, dtype=np.int64)
    weight[1 : alpha + 1] = np.where(freqs == 0, 1, freqs) << 8

    def upheap(nheap_pos):
        zz = nheap_pos
        tmp = heap[zz]
        while weight[tmp] < weight[heap[zz >> 1]]:
            heap[zz] = heap[zz >> 1]
            zz >>= 1
        heap[zz] = tmp

    lens = np.zeros(alpha, dtype=np.int64)
    while True:
        n_nodes = alpha
        n_heap = 0
        heap[0] = 0
        weight[0] = 0
        parent[0] = -2
        for i in range(1, alpha + 1):
            parent[i] = -1
            n_heap += 1
            heap[n_heap] = i
            upheap(n_heap)

        def downheap():
            zz = 1
            tmp = heap[zz]
            while True:
                yy = zz << 1
                if yy > n_heap:
                    break
                if yy < n_heap and weight[heap[yy + 1]] < weight[heap[yy]]:
                    yy += 1
                if weight[tmp] < weight[heap[yy]]:
                    break
                heap[zz] = heap[yy]
                zz = yy
            heap[zz] = tmp

        while n_heap > 1:
            n1 = heap[1]
            heap[1] = heap[n_heap]
            n_heap -= 1
            downheap()
            n2 = heap[1]
            heap[1] = heap[n_heap]
            n_heap -= 1
            downheap()
            n_nodes += 1
            parent[n1] = parent[n2] = n_nodes
            w1, w2 = weight[n1], weight[n2]
            weight[n_nodes] = ((w1 & ~0xFF) + (w2 & ~0xFF)) | (
                1 + max(w1 & 0xFF, w2 & 0xFF)
            )
            parent[n_nodes] = -1
            n_heap += 1
            heap[n_heap] = n_nodes
            upheap(n_heap)
        too_long = False
        for i in range(1, alpha + 1):
            j = 0
            k = i
            while parent[k] >= 0:
                k = parent[k]
                j += 1
            lens[i - 1] = j
            if j > max_len:
                too_long = True
        if not too_long:
            return lens.copy()
        for i in range(1, alpha + 1):
            j = weight[i] >> 8
            weight[i] = (1 + j // 2) << 8


def c_init_tables(freqs: np.ndarray, table_count: int, alpha: int) -> np.ndarray:
    """C-bzip2 initial table seeding: adaptive remaining-frequency portions
    with the alternating back-up-one-symbol endpoint adjustment."""
    tables = np.full((6, 258), 15, dtype=np.int64)
    gs = 0
    n_part = table_count
    rem_f = int(freqs[:alpha].sum())
    while n_part > 0:
        t_freq = rem_f // n_part
        ge = gs - 1
        a_freq = 0
        while a_freq < t_freq and ge < alpha - 1:
            ge += 1
            a_freq += int(freqs[ge])
        if (
            ge > gs
            and n_part != table_count
            and n_part != 1
            and (table_count - n_part) % 2 == 1
        ):
            a_freq -= int(freqs[ge])
            ge -= 1
        tables[n_part - 1, gs : ge + 1] = 0
        n_part -= 1
        gs = ge + 1
        rem_f -= a_freq
    return tables


def _exact_bits(chunk_hist, selectors, lengths, table_count, alpha, nsel):
    """Exact emitted size: payload + unary MTF'd selectors + length deltas."""
    payload = int((chunk_hist * lengths[selectors, :alpha]).sum())
    sel_bits = int(mtf_selectors(selectors, table_count).sum()) + nsel
    dl = np.abs(np.diff(lengths[:table_count, :alpha], axis=1)).sum()
    return payload + sel_bits + int(dl) * 2 + table_count * (alpha + 5)


def assign_selectors_and_lengths(
    rle2: np.ndarray, freqs: np.ndarray, alpha: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """The 4-pass refinement. Returns (selectors, lengths[6,alpha], table_count)."""
    rle2 = np.asarray(rle2, dtype=np.int64)
    table_count = group_count_for(rle2.size)
    nsel = (rle2.size + GROUP_SIZE - 1) // GROUP_SIZE
    # per-chunk histograms over the alphabet: (nsel, alpha)
    pad = nsel * GROUP_SIZE - rle2.size
    padded = np.concatenate((rle2, np.full(pad, -1, dtype=np.int64)))
    chunks = padded.reshape(nsel, GROUP_SIZE)
    # chunk histogram via bincount on chunk_id*alpha + sym
    valid = chunks >= 0
    flat = (np.repeat(np.arange(nsel), GROUP_SIZE).reshape(nsel, GROUP_SIZE)[valid]) * alpha + chunks[valid]
    chunk_hist = np.bincount(flat, minlength=nsel * alpha).reshape(nsel, alpha)
    return refine_from_hist(chunk_hist, rle2.size, freqs, alpha)


def refine_from_hist(
    chunk_hist: np.ndarray, rle2_len: int, freqs: np.ndarray, alpha: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """Refinement core (pure numpy/python oracle): shared semantics with the
    native C++ engine, which tests cross-check element-for-element."""
    table_count = group_count_for(rle2_len)
    nsel = chunk_hist.shape[0]

    def refine(tables, iters, lens_fn, track_best):
        selectors = np.zeros(nsel, dtype=np.int64)
        best = None
        stale = 0
        for it in range(iters):
            cost = chunk_hist @ tables[:table_count, :alpha].T  # (nsel, tc)
            selectors = np.argmin(cost, axis=1)
            for t in range(table_count):
                rfreq = chunk_hist[selectors == t].sum(axis=0)
                tables[t, :alpha] = lens_fn(rfreq, alpha)
            if track_best:
                total = _exact_bits(chunk_hist, selectors, tables, table_count, alpha, nsel)
                if best is None or total < best[0]:
                    best = (total, selectors.copy(), tables[:, :alpha].copy())
                    stale = 0
                else:
                    stale += 1
                # adaptive stop: past the C-faithful 4 passes, quit after
                # ONE flat extra pass — in sync with refine.cpp and the
                # devrefine engine (byte-identity cross-checked in tests)
                if it >= 3 and stale >= 1:
                    break
        if not track_best:
            best = (
                _exact_bits(chunk_hist, selectors, tables, table_count, alpha, nsel),
                selectors,
                tables[:, :alpha].copy(),
            )
        return best

    # C-bzip2-faithful evolution (exact seeding + exact heap tie-breaking,
    # huffman.rs:472-532 / huffman_code_from_weights.rs) run for extra passes
    # beyond the reference's blind 4 (huffman.rs:114), keeping the best
    # snapshot by exact emitted size. The iteration-4 snapshot reproduces the
    # C encoder's exact choices, so the result is never larger than C's.
    _, selectors, lengths = refine(
        c_init_tables(freqs, table_count, alpha),
        huffman_iters(),
        c_code_lengths,
        True,
    )
    return selectors, lengths, table_count


def refine_stream(rle2: np.ndarray, freqs: np.ndarray, alpha: int):
    """Refinement entry shared by the host-reference and device pipelines:
    native C++ engine on the raw symbol stream when available (bit-identical,
    cross-checked in tests), numpy/python fallback otherwise."""
    from ..native import refine_stream_native

    nat = refine_stream_native(np.asarray(rle2, dtype=np.uint16), alpha, huffman_iters())
    if nat is not None:
        return nat
    return assign_selectors_and_lengths(rle2, freqs, alpha)


def mtf_selectors(selectors: np.ndarray, table_count: int) -> np.ndarray:
    from ..native import mtf_selectors_native

    nat = mtf_selectors_native(np.asarray(selectors))
    if nat is not None:
        return nat
    idx = list(range(6))
    out = np.empty(selectors.size, dtype=np.int64)
    for i, s in enumerate(np.asarray(selectors, dtype=np.int64)):
        r = idx.index(int(s))
        out[i] = r
        idx.pop(r)
        idx.insert(0, int(s))
    return out


def huffman_encode(acc: BitAccum, rle2: np.ndarray, freqs: np.ndarray, used: np.ndarray) -> None:
    """Emit symbol map + tables + selectors + payload into ``acc``."""
    alpha = int(np.asarray(used, bool).sum()) + 2
    selectors, lengths, table_count = refine_stream(rle2, freqs, alpha)
    huffman_emit(acc, rle2, used, selectors, lengths, table_count)


def huffman_emit_headers(
    acc: BitAccum,
    used: np.ndarray,
    selectors: np.ndarray,
    lengths: np.ndarray,
    table_count: int,
) -> np.ndarray:
    """Emit everything before the payload: symbol map, table count, selector
    count, MTF'd unary selectors, per-table delta-coded lengths. Returns the
    canonical codes[table_count, alpha] for payload emission."""
    alpha = int(np.asarray(used, bool).sum()) + 2
    # symbol map (bit-position tracing mirrors the reference's format-debug
    # story, bitpacker.rs:109-111 / huffman.rs:208-222)
    log.debug("symbol map written at bit %d", acc.bit_len)
    for w in encode_symbol_map(used):
        acc.put(w, 16)
    log.debug("table count %d written at bit %d", table_count, acc.bit_len)
    acc.put(table_count, 3)
    nsel = selectors.size
    log.debug("selector count %d written at bit %d", nsel, acc.bit_len)
    acc.put(nsel, 15)
    # selectors: MTF + unary (m ones then a zero), vectorized
    m = mtf_selectors(selectors, table_count)
    acc.extend(((1 << m) - 1) << 1, m + 1)
    # per-table code lengths: 5-bit origin, then delta per symbol —
    # vectorized: symbol s emits |d| repetitions of '10' (d>0) or '11'
    # (d<0) then a '0' terminator, built as closed-form bit patterns
    # ('10'*k = 2*(4^k-1)/3, '11'*k = 4^k-1) split into two <=24-bit
    # fields for BitAccum.extend (|d| <= 19 can need up to 39 bits).
    codes = np.zeros((table_count, alpha), dtype=np.int64)
    for t in range(table_count):
        lens = np.asarray(lengths[t][:alpha], dtype=np.int64)
        codes[t] = canonical_codes(lens)
        log.debug(
            "table %d origin %d written at bit %d", t, int(lens[0]), acc.bit_len
        )
        acc.put(int(lens[0]), 5)
        d = np.empty(alpha, dtype=np.int64)
        d[0] = 0
        d[1:] = lens[1:] - lens[:-1]
        ad = np.abs(d)
        k1 = np.minimum(ad, 11)
        k2 = ad - k1

        def pat(k):
            p = (np.int64(1) << (2 * k)) - 1  # '11' * k
            return np.where(d > 0, p // 3 * 2, p)  # '10' * k when rising

        v1, b1 = pat(k1), 2 * k1
        v2, b2 = pat(k2) << 1, 2 * k2 + 1  # terminator rides field 2
        vals = np.stack([v1, v2], axis=1).ravel()
        bits = np.stack([b1, b2], axis=1).ravel()
        keep = bits > 0
        acc.extend(vals[keep], bits[keep])
    return codes


def huffman_emit(
    acc: BitAccum,
    rle2: np.ndarray,
    used: np.ndarray,
    selectors: np.ndarray,
    lengths: np.ndarray,
    table_count: int,
) -> None:
    """Emission half: symbol map, counts, selectors, length deltas, payload."""
    codes = huffman_emit_headers(acc, used, selectors, lengths, table_count)
    log.debug("payload (%d symbols) written at bit %d", rle2.size, acc.bit_len)
    from ..native import emit_payload_native

    native = emit_payload_native(
        np.asarray(rle2), np.asarray(selectors),
        codes, np.asarray(lengths)[:, : codes.shape[1]],
    )
    if native is not None:
        words, total_bits = native
        acc.put_words(words, total_bits)
        return
    # payload (vectorized numpy fallback): per-symbol (code, len) by the
    # chunk's selector
    rle2 = np.asarray(rle2, dtype=np.int64)
    sel_per_sym = np.repeat(selectors, GROUP_SIZE)[: rle2.size]
    sym_codes = codes[sel_per_sym, rle2].astype(np.uint32)
    sym_bits = lengths[sel_per_sym, rle2].astype(np.int64)
    acc.extend(sym_codes, sym_bits)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def read_huffman_tables(br: BitReader, alpha: int, table_count: int) -> np.ndarray:
    """Read per-table code lengths (deltas) -> lengths[table_count, alpha]."""
    lengths = np.zeros((table_count, alpha), dtype=np.int64)
    for t in range(table_count):
        cur = br.read(5)
        for s in range(alpha):
            while br.read_bit():
                if br.read_bit():
                    cur -= 1
                else:
                    cur += 1
            if not (1 <= cur <= MAX_CODE_LEN_DECODE):
                raise ValueError(f"invalid code length {cur}")
            lengths[t, s] = cur
    return lengths


def build_decode_table(lengths: np.ndarray) -> dict:
    """Canonical decode tables: per-length base code / base offset + symbol list."""
    alpha = lengths.size
    order = np.lexsort((np.arange(alpha), lengths))
    sorted_syms = order.astype(np.int64)
    codes = canonical_codes(lengths)
    min_len = int(lengths.min())
    max_len = int(lengths.max())
    # limit[l] = max code of length l (exclusive), base[l] = first code, off[l]
    base = np.zeros(max_len + 2, dtype=np.int64)
    limit = np.full(max_len + 2, -1, dtype=np.int64)
    off = np.zeros(max_len + 2, dtype=np.int64)
    sorted_lens = lengths[order]
    pos = 0
    for l in range(min_len, max_len + 1):
        cnt = int((sorted_lens == l).sum())
        if cnt:
            base[l] = int(codes[order[pos]])
            off[l] = pos
            limit[l] = base[l] + cnt - 1
        else:
            # empty level: keep monotone limits so decode walks past it
            prev_limit = limit[l - 1] if l > min_len else -1
            base[l] = (prev_limit + 1) << 1
            off[l] = pos
            limit[l] = base[l] - 1
        pos += cnt
    return {
        "min_len": min_len,
        "max_len": max_len,
        "base": base,
        "limit": limit,
        "off": off,
        "syms": sorted_syms,
    }


def huffman_decode_payload(
    br: BitReader, tables: list[dict], selectors: np.ndarray, eob: int
) -> np.ndarray:
    """Decode symbols until EOB. Returns the symbol array excluding EOB.

    With TPUBZ_TRACE_BITS set (CLI --trace-bits), every decoded symbol
    logs its bit position — the decode-side counterpart of the encoder's
    header traces and the reference's per-symbol format-debugging story
    (decompress.rs:312-318)."""
    import os

    trace = bool(os.environ.get("TPUBZ_TRACE_BITS"))
    out: list[int] = []
    group = -1
    g_left = 0
    t = None
    while True:
        if g_left == 0:
            group += 1
            if group >= selectors.size:
                raise ValueError("ran out of selectors before EOB")
            t = tables[int(selectors[group])]
            g_left = GROUP_SIZE
        g_left -= 1
        pos0 = br.pos
        l = t["min_len"]
        code = br.read(l)
        while code > t["limit"][l]:
            if l >= t["max_len"]:
                raise ValueError("invalid Huffman code in payload")
            code = (code << 1) | br.read_bit()
            l += 1
        sym = int(t["syms"][t["off"][l] + code - t["base"][l]])
        if trace:
            log.debug(
                "sym %d (table %d, %d bits) read at bit %d",
                sym, int(selectors[group]), l, pos0,
            )
        if sym == eob:
            return np.asarray(out, dtype=np.uint16)
        out.append(sym)
