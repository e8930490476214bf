"""Batched multi-stream decoder.

Decodes N concurrent streams of one resolution bucket as a single device
program per frame step.  Host entropy decode runs per stream (serial by
nature); the dense tensors are stacked along the leading stream axis and the
whole batch reconstructs in one jitted XLA call, with reference planes kept
device-resident between frames.

Per-stream header state (running options, TR bookkeeping, reference rules)
follows H263State semantics exactly — see decoder/state.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..bitio import BitReader
from ..decoder.reconstruct import get_batched_reconstruct_fn
from ..parser.frame import FrameData, parse_frame_auto
from ..parser.picture import decode_picture
from ..types import (
    DecoderOption,
    MiddleOfBitstream,
    MPPTYPE_OPTIONS,
    OPPTYPE_OPTIONS,
    Picture,
    PictureFormatInvalid,
    PictureFormatMissing,
    PictureOption,
    PictureTypeCode,
    UncodedIFrameBlocks,
)


class _StreamState:
    __slots__ = ("running_options", "last_header", "has_reference",
                 "is_disposable_last")

    def __init__(self):
        self.running_options = PictureOption.NONE
        self.last_header: Optional[Picture] = None
        self.has_reference = False


class BatchedStreamDecoder:
    """Decode S same-resolution streams in lockstep, one frame per step.

    This is the throughput configuration from BASELINE.json config 4: all
    streams' macroblocks run through shared batched kernels.
    """

    def __init__(self, n_streams: int, width: int, height: int,
                 decoder_options: DecoderOption = DecoderOption.SORENSON_SPARK_BITSTREAM,
                 reconstruct_fn=None):
        import jax.numpy as jnp

        self.n = n_streams
        self.w = width
        self.h = height
        self.cw = (width + 1) // 2
        self.ch = (height + 1) // 2
        self.decoder_options = decoder_options
        self.states = [_StreamState() for _ in range(n_streams)]
        self.ref_y = jnp.zeros((n_streams, self.h, self.w), dtype=jnp.uint8)
        self.ref_cb = jnp.zeros((n_streams, self.ch, self.cw), dtype=jnp.uint8)
        self.ref_cr = jnp.zeros((n_streams, self.ch, self.cw), dtype=jnp.uint8)
        self._fn = reconstruct_fn or get_batched_reconstruct_fn(self.h, self.w)

    # -- host stage -----------------------------------------------------------

    def parse_one(self, stream_idx: int, buf: bytes) -> FrameData:
        """Entropy-decode one stream's next frame to dense tensors."""
        st = self.states[stream_idx]
        r = BitReader(bytes(buf))
        pic = decode_picture(r, self.decoder_options, st.last_header)
        if pic is None:
            raise MiddleOfBitstream()

        if pic.has_plusptype and pic.has_opptype:
            running = pic.options
        elif pic.has_plusptype:
            running = (pic.options & ~OPPTYPE_OPTIONS) | (
                st.running_options & OPPTYPE_OPTIONS)
        else:
            running = (pic.options & ~OPPTYPE_OPTIONS & ~MPPTYPE_OPTIONS) | (
                st.running_options & (OPPTYPE_OPTIONS | MPPTYPE_OPTIONS))

        fmt = pic.format
        if fmt is None:
            if st.last_header is None or pic.picture_type is PictureTypeCode.I_FRAME:
                raise PictureFormatMissing()
            fmt = st.last_header.format
        wh = fmt.width_and_height()
        if wh is None or wh != (self.w, self.h):
            raise PictureFormatInvalid(
                f"stream {stream_idx}: expected {(self.w, self.h)}, got {wh}")

        frame = parse_frame_auto(r, pic, self.decoder_options, running, self.w, self.h)
        if frame.inter.any() and not st.has_reference:
            raise UncodedIFrameBlocks()

        # Commit host-side header state now (state.rs:464-483 semantics);
        # parse order defines stream order.  Reference planes are committed
        # by step().
        if pic.picture_type is PictureTypeCode.I_FRAME:
            st.has_reference = False
        st.last_header = pic
        if not pic.picture_type.is_disposable():
            st.has_reference = True
        st.running_options = running
        return frame

    # -- device stage -----------------------------------------------------------

    def step(self, frames: Sequence[FrameData]):
        """Reconstruct one frame for every stream; updates reference planes.

        Returns (y, cb, cr) batched uint8 arrays [S, ...] (device-resident).
        """
        import jax.numpy as jnp

        assert len(frames) == self.n
        stack = lambda f: np.stack(f)
        coeffs_y = stack([f.coeffs_y for f in frames])
        class_y = stack([f.class_y for f in frames])
        coeffs_cb = stack([f.coeffs_cb for f in frames])
        class_cb = stack([f.class_cb for f in frames])
        coeffs_cr = stack([f.coeffs_cr for f in frames])
        class_cr = stack([f.class_cr for f in frames])
        mvs = stack([f.mvs for f in frames])
        inter = stack([f.inter for f in frames])

        y, cb, cr = self._fn(coeffs_y, class_y, coeffs_cb, class_cb,
                             coeffs_cr, class_cr, mvs, inter,
                             self.ref_y, self.ref_cb, self.ref_cr)

        self.ref_y, self.ref_cb, self.ref_cr = y, cb, cr
        return y, cb, cr

    def decode_step(self, buffers: Sequence[bytes]):
        """Convenience: parse all streams then reconstruct the batch."""
        frames = [self.parse_one(i, b) for i, b in enumerate(buffers)]
        return self.step(frames)
