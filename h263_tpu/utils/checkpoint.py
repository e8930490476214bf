"""Decoder state checkpoint / resume.

The complete inter-frame state of a stream is small and explicit
(state.rs:16-38 semantics): up to two reference pictures, the running
options, and the last/reference temporal references.  These helpers
serialize it to a plain dict of numpy arrays + metadata, so a decode can be
suspended, migrated across hosts/chips, and resumed bit-exactly.

Seeking beyond a checkpoint still requires restarting at an I-frame
(documented contract, state.rs:134-137).
"""

from __future__ import annotations

import pickle
from typing import Optional

import numpy as np


def save_decoder_state(decoder) -> bytes:
    """Snapshot an H263Decoder's complete inter-frame state."""
    from ..decoder.picture import DecodedPicture

    pictures = {}
    for tr, pic in decoder.reference_states.items():
        pictures[tr] = {
            "header": pic.picture_header,
            "format": pic.format,
            "luma": np.asarray(pic.luma),
            "chroma_b": np.asarray(pic.chroma_b),
            "chroma_r": np.asarray(pic.chroma_r),
        }
    return pickle.dumps({
        "version": 1,
        "decoder_options": int(decoder.decoder_options),
        "backend": decoder.backend,
        "last_picture": decoder.last_picture,
        "reference_picture": decoder.reference_picture,
        "running_options": int(decoder.running_options),
        "pictures": pictures,
    })


def load_decoder_state(blob: bytes, backend: Optional[str] = None):
    """Reconstruct an H263Decoder from save_decoder_state output."""
    from ..decoder.picture import DecodedPicture
    from ..decoder.state import H263Decoder
    from ..types import DecoderOption, PictureOption

    d = pickle.loads(blob)
    assert d["version"] == 1
    dec = H263Decoder(DecoderOption(d["decoder_options"]),
                      backend=backend or d["backend"])
    dec.last_picture = d["last_picture"]
    dec.reference_picture = d["reference_picture"]
    dec.running_options = PictureOption(d["running_options"])
    for tr, p in d["pictures"].items():
        dec.reference_states[tr] = DecodedPicture(
            p["header"], p["format"], p["luma"], p["chroma_b"], p["chroma_r"])
    return dec


def save_batched_state(dec) -> bytes:
    """Snapshot a BatchedStreamDecoder's per-stream state + reference planes."""
    return pickle.dumps({
        "version": 1,
        "n": dec.n,
        "w": dec.w,
        "h": dec.h,
        "decoder_options": int(dec.decoder_options),
        "pack_cap": dec.pack_cap,
        "ref_y": np.asarray(dec.ref_y),
        "ref_cb": np.asarray(dec.ref_cb),
        "ref_cr": np.asarray(dec.ref_cr),
        "states": [
            (int(s.running_options), s.last_header, s.has_reference)
            for s in dec.states
        ],
    })


def load_batched_state(blob: bytes, **kwargs):
    """Reconstruct a BatchedStreamDecoder from save_batched_state output."""
    import jax.numpy as jnp

    from ..parallel.batch import BatchedStreamDecoder
    from ..types import DecoderOption, PictureOption

    d = pickle.loads(blob)
    assert d["version"] == 1
    dec = BatchedStreamDecoder(d["n"], d["w"], d["h"],
                               DecoderOption(d["decoder_options"]),
                               pack_cap=d["pack_cap"], **kwargs)
    dec.ref_y = jnp.asarray(d["ref_y"])
    dec.ref_cb = jnp.asarray(d["ref_cb"])
    dec.ref_cr = jnp.asarray(d["ref_cr"])
    for s, (ro, lh, hr) in zip(dec.states, d["states"]):
        from ..types import PictureOption as PO

        s.running_options = PO(ro)
        s.last_header = lh
        s.has_reference = hr
    return dec
