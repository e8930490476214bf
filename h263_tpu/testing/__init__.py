"""Test-support utilities: synthetic bitstream assembly and corpus generation.

The reference ships no end-to-end fixtures (SURVEY.md §4); these tools build
valid Sorenson Spark / H.263 bitstreams from the same spec VLC tables the
decoder uses, giving the test-suite and benchmarks a self-hosted corpus.
This is deliberately NOT a rate-distortion encoder — it assembles exactly
the symbols you specify.
"""

from .encoder import BitWriter, MBSpec, encode_sorenson_picture

__all__ = ["BitWriter", "MBSpec", "encode_sorenson_picture"]
