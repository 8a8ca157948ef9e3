"""Incremental one-shot codec objects — stdlib ``bz2`` drop-ins.

``BZ2Compressor`` / ``BZ2Decompressor`` complete the library surface next
to :func:`tpubz.compress`, :func:`tpubz.decompress` and :func:`tpubz.open`
(the reference is a CLI binary only — reference src/main.rs:16; its users
get this API from the stdlib, so the drop-in must match stdlib semantics:
chunked feeding, ``flush``, ``eof`` / ``unused_data`` / ``needs_input``,
``max_length``).

Compressor: the bounded-memory streaming encoder (stream/files.py) is
pull-oriented, so it runs on a worker thread bridged through the same
bounded chunk queue :func:`tpubz.open` uses; output drains without
blocking on each ``compress()`` call.

Decompressor: in-place parse of one stream from a growing buffer — header,
then blocks via the native GIL-free block decoder (numpy mirror fallback),
footer → ``eof`` with ``unused_data``. A block decode that fails while the
buffered tail is still smaller than the largest possible compressed block
means "need more input"; past that bound it is corrupt (same
disambiguation rule as stream/files.py's bounded-memory decoder). Like the
whole-buffer and streaming-file decoders, candidate block magics in
buffered-but-unparsed bytes pre-decode ahead on a small thread pool, so a
large file fed through the incremental API decodes at the parallel rate
instead of one native call per serial step (the reference decodes strictly
serially — src/compression/decompress.rs:3-4).
"""
from __future__ import annotations

import os
import threading

import numpy as np


class BZ2Compressor:
    """Incremental compressor, drop-in for ``bz2.BZ2Compressor``."""

    def __init__(self, compresslevel: int = 9):
        if not 1 <= compresslevel <= 9:
            raise ValueError("compresslevel must be between 1 and 9")
        from .fileobj import _Bridge, _BridgeReader

        self._bridge = _Bridge()
        self._out: list[bytes] = []
        self._out_lock = threading.Lock()
        self._err: BaseException | None = None
        self._flushed = False

        sink = self

        class _Sink:
            def write(self, data) -> int:
                b = bytes(data)
                with sink._out_lock:
                    sink._out.append(b)
                return len(b)

        def work():
            from .stream.files import compress_stream

            try:
                compress_stream(_BridgeReader(self._bridge), _Sink(),
                                compresslevel)
            except BaseException as e:  # re-raised on the caller's side
                self._err = e

        self._worker = threading.Thread(target=work, daemon=True)
        self._worker.start()

    def _drain(self) -> bytes:
        with self._out_lock:
            chunks, self._out = self._out, []
        return b"".join(chunks)

    def compress(self, data) -> bytes:
        """Feed ``data``; returns whatever compressed bytes are ready (may
        be ``b""`` — completed output is produced per encoded block)."""
        if self._flushed:
            raise ValueError("Compressor has been flushed")
        if self._err is not None:
            raise self._err
        b = bytes(data)
        if b:
            self._bridge.put(b)
        return self._drain()

    def flush(self) -> bytes:
        """Finish the stream; returns the remaining compressed bytes."""
        if self._flushed:
            raise ValueError("Repeated call to flush()")
        self._flushed = True
        self._bridge.close_write()
        self._worker.join()
        if self._err is not None:
            raise self._err
        return self._drain()


class BZ2Decompressor:
    """Incremental single-stream decompressor, drop-in for
    ``bz2.BZ2Decompressor`` (callers loop over a fresh decompressor per
    stream for concatenated input, exactly like the stdlib)."""

    def __init__(self):
        self._buf = b""
        self._pos = 0  # bit position within _buf
        self._level: int | None = None
        self._s_crc = 0
        self._pending = bytearray()  # decoded, not yet returned
        self._done = False  # footer parsed; eof is exposed only once the
        # pending output has fully drained (stdlib contract: eof stays
        # False while decompress(b"", max_length=...) can still return data)
        self.eof = False
        self.unused_data = b""
        self.needs_input = True
        # parallel pre-decode state (see module docstring): candidate magic
        # bit-offset -> [future, bit_shift accumulated across re-bases]
        self._pool = None
        self._predec: dict[int, list] = {}
        self._scanned = 0  # byte offset up to which magics were scanned

    def _shutdown_pool(self) -> None:
        if self._pool is not None:
            for ent in self._predec.values():
                ent[0].cancel()
            self._pool.shutdown(wait=False)
            self._pool = None
        self._predec = {}

    def __del__(self):
        try:
            self._shutdown_pool()
        except Exception:
            pass

    def _scan_predecode(self) -> None:
        """Scan newly buffered bytes for block magics and pre-decode the
        candidates on a thread pool (native decoder releases the GIL). A
        payload false positive just wastes one failed decode; the serial
        walk in _step only consumes a result whose offset it reaches.

        A candidate's first attempt may see a TRUNCATED snapshot (its block
        still partly unreceived — the normal case when the caller feeds
        chunks smaller than a compressed block), so a failed attempt is
        RESUBMITTED against the grown buffer once the block is plausibly
        complete: when a later magic has appeared behind it (the block's
        end is certainly buffered) or, for the stream-tail block with no
        successor, when the buffer has grown >= 256 KiB past the attempt's
        snapshot. Without this, one premature failure parked the candidate
        forever and chunked feeds degraded to fully serial decode."""
        from .format.constants import BLOCK_MAGIC
        from .native import decode_block_native, find_magic_native, get_lib

        if self._level is None or len(self._buf) <= self._scanned:
            return
        if get_lib() is None:
            self._scanned = len(self._buf)
            return
        arr = np.frombuffer(self._buf, np.uint8)
        cur_len = len(self._buf)
        lo = max(self._scanned - 7, 0)
        hits = find_magic_native(arr[lo:], BLOCK_MAGIC)
        self._scanned = cur_len
        if (hits is None or not len(hits)) and not self._predec:
            return
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                int(os.environ.get("TPUBZ_DECODE_THREADS", "4"))
            )
        lvl = self._level

        def _try(b0, a=arr, lv=lvl):
            try:
                return decode_block_native(a, b0 + 48, lv)
            except ValueError:
                return None

        if hits is not None:
            for h in hits:
                b0 = int(h) + lo * 8
                if b0 >= self._pos and b0 not in self._predec:
                    self._predec[b0] = [self._pool.submit(_try, b0), 0, cur_len]
        max_b0 = max(self._predec, default=-1)
        for b0, ent in self._predec.items():
            fut, _sh, snap = ent
            if (
                snap < cur_len
                and fut.done()
                and fut.result() is None
                and (b0 < max_b0 or cur_len - snap >= 1 << 18)
            ):
                # retry on the grown buffer; offsets are current-base, so
                # the accumulated re-base shift resets with the new arr
                ent[0] = self._pool.submit(_try, b0)
                ent[1] = 0
                ent[2] = cur_len

    def _parse_header(self) -> bool:
        from .format.constants import STREAM_MAGIC

        if len(self._buf) < 4:
            return False
        if self._buf[:3] != STREAM_MAGIC:
            raise ValueError("Invalid data stream")
        level = self._buf[3] - 0x30
        if not 1 <= level <= 9:
            raise ValueError("Invalid data stream")
        self._level = level
        self._pos = 32
        return True

    def _step(self) -> bool:
        """Decode one block or the footer. Returns False when more input is
        required."""
        from .format.constants import BLOCK_MAGIC, FOOTER_MAGIC
        from .format.crc import stream_crc_fold
        from .hostref.bitio import BitReader

        if len(self._buf) * 8 - self._pos < 48 + 32:
            return False  # shortest remaining item is footer magic + CRC
        br = BitReader(self._buf)
        br.pos = self._pos
        tag = br.read(48)
        if tag == FOOTER_MAGIC:
            if br.read(32) != self._s_crc:
                raise ValueError("stream CRC mismatch")
            self._done = True
            self.unused_data = self._buf[(br.pos + 7) // 8 :]
            self._buf = b""
            self._shutdown_pool()
            return False
        if tag != BLOCK_MAGIC:
            raise ValueError("invalid block header magic")
        from .native import decode_block_native, get_lib

        arr = np.frombuffer(self._buf, np.uint8)
        entry = self._predec.pop(self._pos, None)
        pre = entry[0].result() if entry is not None else None
        try:
            if pre is not None:
                raw, end_bit, blk_crc, actual = pre
                end_bit -= entry[1]
                raw = raw.tobytes()
            elif get_lib() is not None:
                raw, end_bit, blk_crc, actual = decode_block_native(
                    arr, self._pos + 48, self._level
                )
                raw = raw.tobytes()
            else:
                from .format.crc import block_crc
                from .hostref.block import decode_block

                raw_a, blk_crc = decode_block(br, self._level)
                raw, end_bit, actual = (
                    raw_a.tobytes(), br.pos, block_crc(raw_a),
                )
        except (ValueError, EOFError):
            # ambiguous: block extends past the buffered bytes (the hostref
            # fallback reports that as EOFError, the native decoder as
            # ValueError), or corrupt. A valid compressed block never spans
            # more than ~3x the 900k post-RLE1 budget (worst-case RLE2
            # length at <=20 bits/symbol plus headers) — within that bound,
            # ask for more input.
            max_block_bytes = self._level * 100_000 * 3 + 4096
            if len(self._buf) - self._pos // 8 < max_block_bytes:
                return False
            raise
        if actual != blk_crc:
            raise ValueError("block CRC mismatch")
        self._s_crc = stream_crc_fold(self._s_crc, blk_crc)
        self._pending += raw
        self._pos = end_bit
        # re-base: drop consumed whole bytes so memory tracks the unparsed
        # tail, not the whole stream (pre-decode offsets shift with it;
        # futures hold their own buffer snapshot, so only the recorded
        # end_bit shift changes)
        drop = self._pos // 8
        if drop >= 1 << 20:
            self._buf = self._buf[drop:]
            self._pos -= drop * 8
            shifted: dict[int, list] = {}
            for k, (f, sh, snap) in self._predec.items():
                if k - drop * 8 >= self._pos:
                    shifted[k - drop * 8] = [f, sh + drop * 8, max(snap - drop, 0)]
                else:
                    f.cancel()
            self._predec = shifted
            self._scanned = max(self._scanned - drop, 0)
        return True

    def decompress(self, data, max_length: int = -1) -> bytes:
        if self.eof:
            raise EOFError("End of stream already reached")
        if data:
            self._buf += bytes(data)
        try:
            if self._level is None and self._buf:
                self._parse_header()
            if self._level is not None:
                self._scan_predecode()
                while not self._done and self._step():
                    pass
        except Exception:
            self.needs_input = False
            self._shutdown_pool()
            raise
        if max_length >= 0 and len(self._pending) > max_length:
            out = bytes(self._pending[:max_length])
            del self._pending[:max_length]
        else:
            out, self._pending = bytes(self._pending), bytearray()
        # stdlib contract: eof only once the stream ended AND the buffered
        # output drained; needs_input False whenever output is buffered or
        # the stream has ended
        self.eof = self._done and not self._pending
        self.needs_input = not self._pending and not self._done
        return out
