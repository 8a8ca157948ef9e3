"""bzip2 stream-format constants.

Ground truth mirrors the reference implementation (ohsnyt/bzip2-rust):
  - block magic / footer magic: reference src/compression/compress_block.rs:34-41,
    src/compression/decompress.rs (HEADER/FOOTER consts)
  - block budget ``level*100_000 - 19``: reference src/compression/compress.rs:55
  - Huffman group-count thresholds: reference src/huffman_coding/huffman.rs:87-93
  - selector chunk size 50: reference src/huffman_coding/huffman.rs:139
  - max emitted code length 17 / decoder tolerance 20:
    reference src/huffman_coding/huffman_code_from_weights.rs:65,
    src/compression/decompress.rs:239
  - zero-run decode bomb guard: reference src/tools/rle2_mtf.rs:19
"""

# 48-bit block magic: BCD of pi -> 0x314159265359
BLOCK_MAGIC = 0x314159265359
# 48-bit stream footer magic: BCD of sqrt(pi) -> 0x177245385090
FOOTER_MAGIC = 0x177245385090

STREAM_MAGIC = b"BZh"  # followed by ASCII '1'..'9'

# Post-RLE1 block budget per compression level (1..9).
def block_budget(level: int) -> int:
    return level * 100_000 - 19


def max_block_size(level: int) -> int:
    return level * 100_000


# RLE1: runs of RUN_THRESHOLD..MAX_RUN identical bytes become
# RUN_THRESHOLD literals plus a count byte (0..MAX_RUN-RUN_THRESHOLD).
RUN_THRESHOLD = 4
MAX_RUN = 255
MAX_RUN_COUNT = MAX_RUN - RUN_THRESHOLD  # 251

# RLE2 run symbols (bijective base-2 digits: RUNA=1, RUNB=2).
RUNA = 0
RUNB = 1
ZERO_BOMB = 2 * 1024 * 1024

# Huffman coding parameters.
GROUP_SIZE = 50            # symbols per selector group
MAX_GROUPS = 6
MIN_GROUPS = 2
MAX_ALPHA_SIZE = 258       # 256 byte symbols + RUNA/RUNB overlay + EOB
MAX_CODE_LEN_ENCODE = 17   # encoder never emits longer codes
MAX_CODE_LEN_DECODE = 20   # format envelope the decoder must accept
HUFFMAN_ITERS = 8          # refinement passes; the reference hardcodes 4
                           # (huffman.rs:114) — we run more and keep the
                           # best snapshot by exact emitted size, so extra
                           # passes can only shrink output

_iters_override: int | None = None


def huffman_iters() -> int:
    """Effective refinement pass count: --iterations / TPUBZ_ITERATIONS
    override (the reference parses-but-ignores its `iterations` option,
    cli.rs:72), clamped to >= 4 — the first 4 passes are the C-faithful
    trajectory that pins the <=-C-size guarantee."""
    if _iters_override is not None:
        return _iters_override
    import os

    v = os.environ.get("TPUBZ_ITERATIONS")
    return max(4, int(v)) if v else HUFFMAN_ITERS


def set_huffman_iters(n: int | None) -> None:
    global _iters_override
    _iters_override = None if n is None else max(4, int(n))


def group_count_for(rle2_len: int) -> int:
    """Number of Huffman tables by RLE2 symbol count.

    Thresholds 200/600/1200/2400 per reference src/huffman_coding/huffman.rs:87-93.
    """
    if rle2_len < 200:
        return 2
    if rle2_len < 600:
        return 3
    if rle2_len < 1200:
        return 4
    if rle2_len < 2400:
        return 5
    return 6
