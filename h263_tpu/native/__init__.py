"""Native (C++) host runtime: the serial entropy front-end.

Mirrors the reference's native-code footprint (the reference is pure Rust;
this framework's serial stage is C++ with a ctypes ABI).  Falls back to the
pure-Python front-end when the toolchain is unavailable.
"""

from .bindings import (
    NATIVE_AVAILABLE,
    ensure_built,
    parse_frame_native,
)

__all__ = ["NATIVE_AVAILABLE", "ensure_built", "parse_frame_native"]
