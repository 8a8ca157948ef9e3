"""Render the per-block execution timeline of warm compress() streams.

Uses stream.api.last_stream_events ((engine, in_lo, t0, t1) spans recorded
by the production pipeline) to attribute a trial's wall time: how many
blocks each engine ran concurrently over time, where the serial head
(rle1) and tail (drain + splice) sit, and how much of the wall clock has
NO block executing anywhere (scheduling stalls / throttle). This is the
measurement tool for "the stream is slower than the sum of its engine
legs" questions — dispatch-level timers can't see stalls inside the
ordered drain.

Usage: python tools/probe_timeline.py [MB] [trials]
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np  # noqa: E402

import bench  # noqa: E402
import tpubz  # noqa: E402
from tpubz.stream import api  # noqa: E402


def render(events, wall_t0, wall_t1, width=100):
    wall = wall_t1 - wall_t0
    print(f"  wall {wall*1e3:7.0f} ms")
    rows = {}
    for kind, _lo, t0, t1 in events:
        rows.setdefault(kind, []).append((t0 - wall_t0, t1 - wall_t0))
    # per-engine busy integral and concurrency-over-time strip
    for kind in ("rle1", "dev", "cpu", "splice"):
        spans = rows.get(kind, [])
        if not spans:
            continue
        busy = sum(b - a for a, b in spans)
        strip = []
        for c in range(width):
            lo, hi = wall * c / width, wall * (c + 1) / width
            n = sum(1 for a, b in spans if a < hi and b > lo)
            strip.append(" .123456789"[min(n + 1, 10)] if n else " ")
        print(
            f"  {kind:6s} n={len(spans):3d} busy={busy*1e3:7.0f} ms "
            f"({busy/wall:4.1f}x wall) |{''.join(strip)}|"
        )
    # dead time: no block span active anywhere (excludes rle1/splice)
    blocks = sorted(
        (a, b) for k in ("dev", "cpu") for a, b in rows.get(k, [])
    )
    dead = 0.0
    cur = 0.0
    for a, b in blocks:
        if a > cur:
            dead += a - cur
        cur = max(cur, b)
    if blocks:
        dead += max(0.0, wall - cur)
    print(f"  no-block-running time: {dead*1e3:.0f} ms ({dead/wall:.0%} of wall)")


def main():
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    corpus = bench.build_corpus(mb)
    print(f"corpus {mb} MB; warming...")
    tpubz.compress(corpus[: 4 * 1024 * 1024], 9)
    for t in range(trials):
        t0 = time.time()
        z = tpubz.compress(corpus, 9)
        t1 = time.time()
        # keep the interpreter honest about EVERY trial's output validity
        assert tpubz.decompress(z) == corpus
        mbs = len(corpus) / 1e6 / (t1 - t0)
        st = api.last_stream_stats
        print(
            f"trial {t}: {t1-t0:.3f}s = {mbs:.1f} MB/s  "
            f"(dev {st.get('dev_blocks')}/{st.get('blocks')}, "
            f"cpu_block {st.get('cpu_block_s')}s, "
            f"cadence {st.get('dev_cadence_s')}s)"
        )
        render(list(api.last_stream_events), t0, t1)


if __name__ == "__main__":
    main()
