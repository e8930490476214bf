"""Test-support utilities: synthetic bitstream assembly and corpus generation.

The reference ships no end-to-end fixtures (SURVEY.md §4); these tools build
valid Sorenson Spark / H.263 bitstreams from the same spec VLC tables the
decoder uses, giving the test-suite and benchmarks a self-hosted corpus.
This is deliberately NOT a rate-distortion encoder — it assembles exactly
the symbols you specify.
"""

from .encoder import BitWriter, MBSpec, encode_sorenson_picture


def build_batched_decoder(n, w, h, options=None, *, fused: bool, **kw):
    """BatchedStreamDecoder with the fused transport forced on or off.

    The opt-out mechanism is the H263_TPU_NO_FUSED env var read at
    construction time; this helper owns the save/set/restore dance and
    asserts the decoder actually landed in the requested mode (both the
    fuzz harness and the transport tests need the guarantee)."""
    import os

    from ..parallel.batch import BatchedStreamDecoder
    from ..types import DecoderOption

    if options is None:
        options = DecoderOption.SORENSON_SPARK_BITSTREAM
    old = os.environ.pop("H263_TPU_NO_FUSED", None)
    try:
        if not fused:
            os.environ["H263_TPU_NO_FUSED"] = "1"
        dec = BatchedStreamDecoder(n, w, h, options, **kw)
        assert dec._fused_enabled == fused
        return dec
    finally:
        os.environ.pop("H263_TPU_NO_FUSED", None)
        if old is not None:
            os.environ["H263_TPU_NO_FUSED"] = old


__all__ = ["BitWriter", "MBSpec", "encode_sorenson_picture",
           "build_batched_decoder"]
