"""Incremental (streaming) bitstream input.

The reference decodes from any ``std::io::Read`` with incremental
buffering and commit-frees (reader.rs:15-30, 335-365): bytes are pulled
as the bit cursor advances, and committed prefixes are released.  The TPU
rebuild keeps complete-frame buffers on the hot path (fixed shapes, one
host->device transfer per step), so streaming is provided one level up:
an incremental **frame segmenter** that accumulates arriving bytes,
delimits pictures at their byte-aligned start codes (H.263 5.1.1 PSTUF
guarantees byte alignment of the PSC in transmitted streams), and frees
consumed prefixes — the same buffering contract, at the frame boundary
the batch pipeline actually consumes.

Use ``FrameSegmenter`` directly for custom pipelines, or
``decode_stream`` to drive a single-stream decoder from a file-like
object / chunk iterable.
"""

from __future__ import annotations

from typing import IO, Iterable, Iterator, Optional, Union


def _find_psc(buf: bytearray, start: int) -> int:
    """Index of the next byte-aligned picture start code at/after `start`.

    The PSC is 16 zero bits followed by a 1 (plus 5 more code bits); byte
    aligned that is 0x00 0x00 then a byte with the top bit set.  Returns
    -1 if none is present.
    """
    i = start
    n = len(buf)
    while True:
        i = buf.find(b"\x00\x00", i)
        if i < 0 or i + 2 >= n:
            return -1
        if buf[i + 2] & 0x80:
            return i
        i += 1


class FrameSegmenter:
    """Accumulate arriving bytes; yield complete picture payloads.

    feed(chunk) appends; frames() yields every COMPLETE picture currently
    buffered (a picture is complete when the next picture's start code has
    arrived); finish() yields the final, possibly unterminated picture at
    end of stream.  Consumed bytes are freed (commit), bounding memory to
    the largest in-flight picture plus one chunk.

    Bytes ahead of the first start code (garbage, container residue) are
    discarded — the same resynchronization the reference performs with its
    in-error unlimited start-code scan (reader.rs:236-256).
    """

    def __init__(self, max_buffer: int = 1 << 26):
        self._buf = bytearray()
        self._synced = False
        self._scan_from = 0  # resume offset for boundary scanning
        self.max_buffer = max_buffer
        self.bytes_discarded = 0

    def feed(self, chunk: bytes) -> None:
        self._buf += chunk
        if len(self._buf) > self.max_buffer:
            raise MemoryError(
                f"FrameSegmenter buffer exceeded {self.max_buffer} bytes "
                f"without a picture boundary")

    def _sync(self) -> bool:
        """Drop garbage ahead of the first start code; True once synced."""
        if self._synced:
            return True
        first = _find_psc(self._buf, 0)
        if first < 0:
            # Keep the last 2 bytes (a start code may straddle chunks).
            if len(self._buf) > 2:
                self.bytes_discarded += len(self._buf) - 2
                del self._buf[:-2]
            return False
        if first > 0:
            self.bytes_discarded += first
            del self._buf[:first]
        self._synced = True
        self._scan_from = 3  # skip past this frame's own start code
        return True

    def frames(self) -> Iterator[bytes]:
        """Yield each complete buffered picture; frees consumed bytes."""
        if not self._sync():
            return
        while True:
            nxt = _find_psc(self._buf, self._scan_from)
            if nxt < 0:
                # Resume scanning where we stopped (minus straddle slack).
                self._scan_from = max(3, len(self._buf) - 2)
                return
            frame = bytes(self._buf[:nxt])
            del self._buf[:nxt]  # commit: free the consumed prefix
            self._scan_from = 3
            yield frame

    def finish(self) -> Iterator[bytes]:
        """Yield the final picture once the byte source is exhausted."""
        if self._synced and self._buf:
            frame = bytes(self._buf)
            self._buf = bytearray()
            yield frame

    @property
    def buffered(self) -> int:
        return len(self._buf)


def iter_stream_frames(source: Union[IO[bytes], Iterable[bytes]],
                       chunk_size: int = 1 << 16,
                       max_buffer: int = 1 << 26) -> Iterator[bytes]:
    """Picture payloads from a file-like object or an iterable of chunks."""
    seg = FrameSegmenter(max_buffer=max_buffer)
    if hasattr(source, "read"):
        def chunks():
            while True:
                c = source.read(chunk_size)
                if not c:
                    return
                yield c
        it: Iterable[bytes] = chunks()
    else:
        it = source
    for chunk in it:
        seg.feed(chunk)
        yield from seg.frames()
    yield from seg.finish()


def decode_stream(source: Union[IO[bytes], Iterable[bytes]], decoder,
                  chunk_size: int = 1 << 16,
                  max_buffer: int = 1 << 26):
    """Decode a raw H.263 byte stream incrementally.

    Yields the decoder's DecodedPicture for each picture in the stream.
    `decoder` is an H263Decoder; `source` a binary file-like object or an
    iterable of byte chunks (sockets, HTTP bodies, ...).
    """
    for payload in iter_stream_frames(source, chunk_size, max_buffer):
        pic = decoder.decode_next_picture(payload)
        if pic is not None:
            yield pic
