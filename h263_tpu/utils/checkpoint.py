"""Decoder state checkpoint / resume.

The complete inter-frame state of a stream is small and explicit
(state.rs:16-38 semantics): up to two reference pictures, the running
options, and the last/reference temporal references.  These helpers
serialize it so a decode can be suspended, migrated across hosts/chips,
and resumed bit-exactly.

Format (v2, current): a zip archive written by ``np.savez`` whose member
``meta`` holds a JSON document (schema below) and whose remaining members
are the raw uint8 planes.  Every header field is spelled out as JSON
primitives — no Python object graphs — so blobs survive refactors of the
``Picture`` dataclass and can be read by other tooling.  v1 blobs (pickled
dataclasses from round 1) are still loadable; the loader sniffs the zip
magic to pick the path.

Seeking beyond a checkpoint still requires restarting at an I-frame
(documented contract, state.rs:134-137).
"""

from __future__ import annotations

import io
import json
import pickle
from typing import Optional

import numpy as np

FORMAT_VERSION = 2
_ZIP_MAGIC = b"PK\x03\x04"


# ---------------------------------------------------------------------------
# Picture header <-> JSON-primitive dict
# ---------------------------------------------------------------------------


def _format_to_dict(fmt) -> Optional[dict]:
    if fmt is None:
        return None
    d = {"kind": fmt.kind.value}
    if fmt.custom is not None:
        c = fmt.custom
        d["custom"] = {
            "par": c.pixel_aspect_ratio.value,
            "width": c.width,
            "height": c.height,
            "par_width": c.par_width,
            "par_height": c.par_height,
        }
    return d


def _format_from_dict(d):
    from ..types import (CustomPictureFormat, PixelAspectRatio, SourceFormat,
                         SourceFormatKind)

    if d is None:
        return None
    custom = None
    if d.get("custom") is not None:
        c = d["custom"]
        custom = CustomPictureFormat(
            PixelAspectRatio(c["par"]), c["width"], c["height"],
            c["par_width"], c["par_height"])
    return SourceFormat(SourceFormatKind(d["kind"]), custom)


def picture_to_dict(pic) -> Optional[dict]:
    """Explicit JSON-primitive schema for a parsed picture header."""
    if pic is None:
        return None
    sl = pic.scalability_layer
    return {
        "version": pic.version,
        "temporal_reference": pic.temporal_reference,
        "format": _format_to_dict(pic.format),
        "options": int(pic.options),
        "has_plusptype": pic.has_plusptype,
        "has_opptype": pic.has_opptype,
        "picture_type": pic.picture_type.value,
        "motion_vector_range": (None if pic.motion_vector_range is None
                                else pic.motion_vector_range.value),
        "slice_submode": (None if pic.slice_submode is None
                          else int(pic.slice_submode)),
        "scalability_layer": (None if sl is None
                              else [sl.enhancement, sl.reference]),
        "reference_picture_selection_mode": (
            None if pic.reference_picture_selection_mode is None
            else int(pic.reference_picture_selection_mode)),
        "prediction_reference": pic.prediction_reference,
        "quantizer": pic.quantizer,
        "multiplex_bitstream": pic.multiplex_bitstream,
        "pb_reference": pic.pb_reference,
        "pb_quantizer": (None if pic.pb_quantizer is None
                         else int(pic.pb_quantizer)),
        "extra": pic.extra.hex(),
    }


def picture_from_dict(d):
    if d is None:
        return None
    from ..types import (BPictureQuantizer, MotionVectorRange, Picture,
                         PictureOption, PictureTypeCode,
                         ReferencePictureSelectionMode, ScalabilityLayer,
                         SliceSubmode)

    sl = d["scalability_layer"]
    return Picture(
        version=d["version"],
        temporal_reference=d["temporal_reference"],
        format=_format_from_dict(d["format"]),
        options=PictureOption(d["options"]),
        has_plusptype=d["has_plusptype"],
        has_opptype=d["has_opptype"],
        picture_type=PictureTypeCode(d["picture_type"]),
        motion_vector_range=(None if d["motion_vector_range"] is None
                             else MotionVectorRange(d["motion_vector_range"])),
        slice_submode=(None if d["slice_submode"] is None
                       else SliceSubmode(d["slice_submode"])),
        scalability_layer=(None if sl is None
                           else ScalabilityLayer(sl[0], sl[1])),
        reference_picture_selection_mode=(
            None if d["reference_picture_selection_mode"] is None
            else ReferencePictureSelectionMode(
                d["reference_picture_selection_mode"])),
        prediction_reference=d["prediction_reference"],
        backchannel_message=None,
        reference_picture_resampling=None,
        quantizer=d["quantizer"],
        multiplex_bitstream=d["multiplex_bitstream"],
        pb_reference=d["pb_reference"],
        pb_quantizer=(None if d["pb_quantizer"] is None
                      else BPictureQuantizer(d["pb_quantizer"])),
        extra=bytes.fromhex(d["extra"]),
    )


def _pack(meta: dict, arrays: dict) -> bytes:
    buf = io.BytesIO()
    meta_arr = np.frombuffer(json.dumps(meta).encode("utf-8"), dtype=np.uint8)
    np.savez(buf, meta=meta_arr, **arrays)
    return buf.getvalue()


def _unpack(blob: bytes):
    z = np.load(io.BytesIO(blob), allow_pickle=False)
    meta = json.loads(bytes(z["meta"]).decode("utf-8"))
    return meta, z


# ---------------------------------------------------------------------------
# Single-stream decoder state
# ---------------------------------------------------------------------------


def save_decoder_state(decoder) -> bytes:
    """Snapshot an H263Decoder's complete inter-frame state (format v2)."""
    arrays = {}
    pictures = []
    for idx, (tr, pic) in enumerate(sorted(decoder.reference_states.items())):
        pictures.append({
            "tr": tr,
            "header": picture_to_dict(pic.picture_header),
            "format": _format_to_dict(pic.format),
            "planes": f"pic{idx}",
        })
        arrays[f"pic{idx}_y"] = np.asarray(pic.luma)
        arrays[f"pic{idx}_cb"] = np.asarray(pic.chroma_b)
        arrays[f"pic{idx}_cr"] = np.asarray(pic.chroma_r)
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "decoder",
        "decoder_options": int(decoder.decoder_options),
        "backend": decoder.backend,
        "last_picture": decoder.last_picture,
        "reference_picture": decoder.reference_picture,
        "running_options": int(decoder.running_options),
        "pictures": pictures,
    }
    return _pack(meta, arrays)


def load_decoder_state(blob: bytes, backend: Optional[str] = None):
    """Reconstruct an H263Decoder from save_decoder_state output (v1 or v2)."""
    from ..decoder.picture import DecodedPicture
    from ..decoder.state import H263Decoder
    from ..types import DecoderOption, PictureOption

    if not blob.startswith(_ZIP_MAGIC):
        return _load_decoder_state_v1(blob, backend)
    meta, z = _unpack(blob)
    assert meta["format_version"] == FORMAT_VERSION
    assert meta["kind"] == "decoder"
    dec = H263Decoder(DecoderOption(meta["decoder_options"]),
                      backend=backend or meta["backend"])
    dec.last_picture = meta["last_picture"]
    dec.reference_picture = meta["reference_picture"]
    dec.running_options = PictureOption(meta["running_options"])
    for p in meta["pictures"]:
        key = p["planes"]
        dec.reference_states[p["tr"]] = DecodedPicture(
            picture_from_dict(p["header"]), _format_from_dict(p["format"]),
            z[f"{key}_y"], z[f"{key}_cb"], z[f"{key}_cr"])
    return dec


def _load_decoder_state_v1(blob: bytes, backend: Optional[str]):
    """Round-1 pickle blobs (version 1) stay loadable."""
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


# ---------------------------------------------------------------------------
# Batched decoder state
# ---------------------------------------------------------------------------


def save_batched_state(dec) -> bytes:
    """Snapshot a BatchedStreamDecoder's per-stream state + reference planes
    (format v2)."""
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "batched",
        "n": dec.n,
        "w": dec.w,
        "h": dec.h,
        "decoder_options": int(dec.decoder_options),
        "pack_cap": dec.pack_cap,
        "states": [
            {"running_options": int(s.running_options),
             "last_header": picture_to_dict(s.last_header),
             "has_reference": s.has_reference}
            for s in dec.states
        ],
    }
    arrays = {
        "ref_y": np.asarray(dec.ref_y),
        "ref_cb": np.asarray(dec.ref_cb),
        "ref_cr": np.asarray(dec.ref_cr),
    }
    return _pack(meta, arrays)


def load_batched_state(blob: bytes, **kwargs):
    """Reconstruct a BatchedStreamDecoder from save_batched_state output
    (v1 or v2)."""
    import jax.numpy as jnp

    from ..parallel.batch import BatchedStreamDecoder
    from ..types import DecoderOption, PictureOption

    if not blob.startswith(_ZIP_MAGIC):
        return _load_batched_state_v1(blob, **kwargs)
    meta, z = _unpack(blob)
    assert meta["format_version"] == FORMAT_VERSION
    assert meta["kind"] == "batched"
    dec = BatchedStreamDecoder(meta["n"], meta["w"], meta["h"],
                               DecoderOption(meta["decoder_options"]),
                               pack_cap=meta["pack_cap"], **kwargs)
    dec.ref_y = jnp.asarray(z["ref_y"])
    dec.ref_cb = jnp.asarray(z["ref_cb"])
    dec.ref_cr = jnp.asarray(z["ref_cr"])
    for s, sd in zip(dec.states, meta["states"]):
        s.running_options = PictureOption(sd["running_options"])
        s.last_header = picture_from_dict(sd["last_header"])
        s.has_reference = sd["has_reference"]
    return dec


def _load_batched_state_v1(blob: bytes, **kwargs):
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
        s.running_options = PictureOption(ro)
        s.last_header = lh
        s.has_reference = hr
    return dec
