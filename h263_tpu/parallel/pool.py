"""Mixed-resolution stream pool: bucket streams by picture size.

Streams of different resolutions cannot share one XLA program (static
shapes), so the pool groups them into per-resolution BatchedStreamDecoder
buckets (SURVEY.md §7 hard part 4: "bucket by MB count and pad").  Each
bucket decodes in lockstep; buckets are independent of each other.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..types import DecoderOption
from .batch import BatchedStreamDecoder


class StreamPool:
    """Decode many streams of mixed resolutions.

    Usage:
        pool = StreamPool()
        pool.add_stream("a", 352, 288)
        pool.add_stream("b", 176, 144)
        ...
        planes = pool.decode_step({"a": buf_a, "b": buf_b, ...})
        planes["a"]  # -> (y, cb, cr) numpy views for stream "a"
    """

    def __init__(self, decoder_options: DecoderOption = DecoderOption.SORENSON_SPARK_BITSTREAM,
                 **decoder_kwargs):
        self.decoder_options = decoder_options
        self.decoder_kwargs = decoder_kwargs
        self._pending: dict = {}          # (w, h) -> [stream_id, ...]
        self._buckets: dict = {}          # (w, h) -> (decoder, {sid: slot})

    def add_stream(self, stream_id, width: int, height: int) -> None:
        """Register a stream; buckets finalize lazily on first decode."""
        key = (width, height)
        assert not any(stream_id in slots
                       for _, slots in self._buckets.values()), "duplicate id"
        if key in self._buckets:
            raise RuntimeError(
                f"bucket {key} already finalized; add streams before decoding")
        self._pending.setdefault(key, []).append(stream_id)

    def _finalize(self, key):
        ids = self._pending.pop(key)
        dec = BatchedStreamDecoder(len(ids), key[0], key[1],
                                   self.decoder_options, **self.decoder_kwargs)
        self._buckets[key] = (dec, {sid: i for i, sid in enumerate(ids)})

    def decode_step(self, buffers: dict) -> dict:
        """Decode one frame for every registered stream.

        `buffers` maps stream_id -> frame payload; every stream must be
        present (buckets run in lockstep).  Returns stream_id -> (y, cb, cr)
        numpy arrays.
        """
        for key in list(self._pending):
            self._finalize(key)

        out = {}
        for key, (dec, slots) in self._buckets.items():
            batch = [None] * dec.n
            for sid, slot in slots.items():
                batch[slot] = buffers[sid]
            y, cb, cr = dec.decode_step(batch)
            y, cb, cr = np.asarray(y), np.asarray(cb), np.asarray(cr)
            for sid, slot in slots.items():
                out[sid] = (y[slot], cb[slot], cr[slot])
        return out

    def present_rgba(self, deblock: Optional[bool] = None) -> dict:
        """RGBA for every stream's last decoded frame."""
        out = {}
        for key, (dec, slots) in self._buckets.items():
            rgba = np.asarray(dec.present_rgba(deblock))
            for sid, slot in slots.items():
                out[sid] = rgba[slot]
        return out
