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

Covered surfaces: the single-stream ``H263Decoder``, the batched
``BatchedStreamDecoder``, the ``DeviceFrontendDecoder`` (device entropy
automaton), and the serving ``StreamPool`` (whole-pool membership +
per-bucket decoder states).

Saving fetches the reference planes to host memory.  On the tunneled-axon
TPU platform that is not merely slow: the FIRST readback of a computed
array permanently flips the process into ~1 s-per-dispatch synchronous
mode (CLAUDE.md "readback trap"), and a whole-batch plane fetch can stall
for minutes.  There, save is a SUSPEND/MIGRATE operation — checkpoint and
then exit (resume in a fresh process) — not a mid-serving snapshot.  On
directly-attached backends it is an ordinary sync point.
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
        "coef_transport": dec.coef_transport,
        "mv_full": bool(dec._mv_full),
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
        # Standard-H.263 format-inheritance sticky (batch.py _std_prev_fmt):
        # a P-frame right after resume would otherwise lose the previous
        # picture's source-format bits and take the slow/strict path.
        "std_prev_fmt": np.asarray(dec._std_prev_fmt),
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
    # The saved transport is the default (a split-transport decoder must
    # not silently resume as d24); explicit kwargs still override.
    kwargs.setdefault("coef_transport", meta.get("coef_transport", "auto"))
    kwargs.setdefault("pack_cap", meta["pack_cap"])
    dec = BatchedStreamDecoder(meta["n"], meta["w"], meta["h"],
                               DecoderOption(meta["decoder_options"]),
                               **kwargs)
    dec.ref_y = jnp.asarray(z["ref_y"])
    dec.ref_cb = jnp.asarray(z["ref_cb"])
    dec.ref_cr = jnp.asarray(z["ref_cr"])
    # Optional members: absent in blobs written before these fields were
    # checkpointed; the defaults (fresh-decoder values) then apply.
    dec._mv_full = bool(meta.get("mv_full", False))
    if "std_prev_fmt" in getattr(z, "files", ()):
        dec._std_prev_fmt[:] = z["std_prev_fmt"]
    for s, sd in zip(dec.states, meta["states"]):
        s.running_options = PictureOption(sd["running_options"])
        s.last_header = picture_from_dict(sd["last_header"])
        s.has_reference = sd["has_reference"]
    return dec


# ---------------------------------------------------------------------------
# Device-front-end decoder state
# ---------------------------------------------------------------------------


def save_device_frontend_state(dec) -> bytes:
    """Snapshot a DeviceFrontendDecoder (format v2).

    Materializes the reference planes (and per-stream status) to host
    memory.  On the tunneled-axon TPU this is a suspend/migrate operation
    (checkpoint, then exit and resume in a fresh process) — the first
    computed-array readback permanently degrades the process; see the
    module docstring."""
    bufs = [b if b is None else bytes(b) for b in dec._last_buffers]
    blob_bufs = b"".join(b for b in bufs if b is not None)
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "device_frontend",
        "n": dec.n,
        "w": dec.w,
        "h": dec.h,
        "decoder_options": int(dec.decoder_options),
        "tape_len": dec.tape_len,
        "max_frame_bytes": dec.max_frame_bytes,
        "harness": dec.harness,
        "unroll": dec.unroll,
        "pallas": dec.pallas,
        # Payload layout is part of the decoder's jit signature/transport
        # contract: a decoder pinned to 'rows' must not silently restore
        # as 'ragged' via the 'auto' default (ADVICE r3).
        "payload": dec.payload,
        "pictures": [picture_to_dict(p) for p in dec._pictures],
        "running": [int(r) for r in dec._running],
        # Per-stream last raw frame (resolve_overflows' repair input);
        # -1 marks streams with none.  Lengths index into the "bufs" blob.
        "buf_lens": [-1 if b is None else len(b) for b in bufs],
        "has_status": dec.last_status is not None,
    }
    arrays = {
        "ref_y": np.asarray(dec.ref_y),
        "ref_cb": np.asarray(dec.ref_cb),
        "ref_cr": np.asarray(dec.ref_cr),
        "last_quant": np.asarray(dec._last_quant),
        "last_deblock": np.asarray(dec._last_deblock),
        "bufs": np.frombuffer(blob_bufs, dtype=np.uint8).copy(),
    }
    if dec.last_status is not None:
        arrays["status"] = np.asarray(dec.last_status)
    return _pack(meta, arrays)


def load_device_frontend_state(blob: bytes, **kwargs):
    """Reconstruct a DeviceFrontendDecoder from save_device_frontend_state
    output.  `kwargs` override the saved constructor knobs (e.g. pass
    ``pallas="off"``/``harness="xla"`` when resuming a TPU-written blob on
    a CPU backend)."""
    import jax.numpy as jnp

    from ..parallel.device_batch import DeviceFrontendDecoder
    from ..types import DecoderOption

    meta, z = _unpack(blob)
    assert meta["format_version"] == FORMAT_VERSION
    assert meta["kind"] == "device_frontend"
    ctor = {
        "pallas": meta["pallas"],
        "tape_len": meta["tape_len"],
        "max_frame_bytes": meta["max_frame_bytes"],
        # Round-4 blobs could record the since-retired Pallas parse
        # harness (docs/retired/parse_pallas.py); on hardware those always
        # ran the XLA fallback anyway, so the coercion changes nothing.
        "harness": ("xla" if str(meta["harness"]).startswith("pallas")
                    else meta["harness"]),
        "unroll": meta.get("unroll", 4),
        # Older blobs (pre-payload) restore with 'auto' — the only layout
        # that existed when they were written resolves identically.
        "payload": meta.get("payload", "auto"),
    }
    ctor.update(kwargs)
    dec = DeviceFrontendDecoder(meta["n"], meta["w"], meta["h"],
                                DecoderOption(meta["decoder_options"]),
                                **ctor)
    dec.ref_y = jnp.asarray(z["ref_y"])
    dec.ref_cb = jnp.asarray(z["ref_cb"])
    dec.ref_cr = jnp.asarray(z["ref_cr"])
    dec._last_quant[:] = z["last_quant"]
    dec._last_deblock[:] = z["last_deblock"]
    if meta["has_status"]:
        dec.last_status = jnp.asarray(z["status"])
    dec._pictures = [picture_from_dict(p) for p in meta["pictures"]]
    from ..types import PictureOption

    dec._running = [PictureOption(r)
                    for r in meta.get("running", [0] * meta["n"])]
    raw = bytes(z["bufs"])
    bufs, off = [], 0
    for ln in meta["buf_lens"]:
        if ln < 0:
            bufs.append(None)
        else:
            bufs.append(raw[off:off + ln])
            off += ln
    dec._last_buffers = bufs
    return dec


# ---------------------------------------------------------------------------
# Serving-pool state
# ---------------------------------------------------------------------------

# Stream ids serialize as [tag, value] pairs so int and str ids round-trip
# distinguishably through JSON.
_SID_TAGS = {str: "s", int: "i"}


def _sid_to_json(sid):
    tag = _SID_TAGS.get(type(sid))
    if tag is None:
        raise TypeError(
            f"stream id {sid!r} is not checkpointable (str or int only)")
    return [tag, sid]


def _sid_from_json(pair):
    tag, value = pair
    return str(value) if tag == "s" else int(value)


def save_pool_state(pool) -> bytes:
    """Snapshot a StreamPool: membership, per-bucket decoder states, free
    slots, and pending (never-decoded) registrations (format v2).

    Stream ids must be str or int; ``decoder_kwargs`` must be
    JSON-serializable.  Same readback caveat as the per-decoder savers
    (module docstring): on the tunneled TPU, suspend/migrate only."""
    try:
        json.dumps(pool.decoder_kwargs)
    except TypeError as e:
        raise TypeError(
            f"pool decoder_kwargs are not checkpointable: {e}") from None
    save_bucket = (save_device_frontend_state
                   if pool.frontend == "device" else save_batched_state)
    buckets = []
    arrays = {}
    for idx, ((w, h), bucket) in enumerate(sorted(pool._buckets.items())):
        member = f"bucket{idx}"
        buckets.append({
            "w": w,
            "h": h,
            "member": member,
            "slots": [[_sid_to_json(sid), slot]
                      for sid, slot in bucket.slots.items()],
            "free": list(bucket.free),
        })
        arrays[member] = np.frombuffer(save_bucket(bucket.dec),
                                       dtype=np.uint8).copy()
    meta = {
        "format_version": FORMAT_VERSION,
        "kind": "pool",
        "decoder_options": int(pool.decoder_options),
        "frontend": pool.frontend,
        "decoder_kwargs": pool.decoder_kwargs,
        "max_dims": list(pool.max_dims),
        "dims": [[_sid_to_json(sid), w, h]
                 for sid, (w, h) in pool._dims.items()],
        "pending": [[w, h, [_sid_to_json(sid) for sid in sids]]
                    for (w, h), sids in pool._pending.items()],
        "pending_running": [[_sid_to_json(sid), int(r)]
                            for sid, r in pool._pending_running.items()],
        "buckets": buckets,
    }
    return _pack(meta, arrays)


def load_pool_state(blob: bytes, **decoder_kwargs_override):
    """Reconstruct a StreamPool from save_pool_state output.  Keyword
    arguments override the saved per-bucket decoder kwargs (e.g.
    ``pallas="off"`` when resuming on a different backend)."""
    from ..parallel.pool import StreamPool, _Bucket
    from ..types import DecoderOption

    meta, z = _unpack(blob)
    assert meta["format_version"] == FORMAT_VERSION
    assert meta["kind"] == "pool"
    kwargs = dict(meta["decoder_kwargs"])
    kwargs.update(decoder_kwargs_override)
    from ..types import PictureOption

    pool = StreamPool(DecoderOption(meta["decoder_options"]),
                      frontend=meta["frontend"],
                      max_dims=tuple(meta.get("max_dims", (2048, 2048))),
                      **kwargs)
    pool._dims = {_sid_from_json(sid): (w, h)
                  for sid, w, h in meta["dims"]}
    pool._pending = {(w, h): [_sid_from_json(sid) for sid in sids]
                     for w, h, sids in meta["pending"]}
    pool._pending_running = {_sid_from_json(sid): PictureOption(r)
                             for sid, r in meta.get("pending_running", [])}
    # The per-bucket loaders take their constructor knobs from their own
    # sub-blob meta; STALE pool-level kwargs that duplicate those knobs
    # must not clobber runtime-updated sub-blob values — but an EXPLICIT
    # caller override (e.g. a larger tape_len to stop recurring overflows)
    # must win over both.
    if meta["frontend"] == "device":
        load_bucket = load_device_frontend_state
        meta_owned = ("tape_len", "max_frame_bytes", "harness")
    else:
        load_bucket = load_batched_state
        meta_owned = ("pack_cap",)
    sub_kwargs = {k: v for k, v in kwargs.items()
                  if k not in meta_owned or k in decoder_kwargs_override}
    for b in meta["buckets"]:
        dec = load_bucket(bytes(z[b["member"]]), **sub_kwargs)
        bucket = _Bucket(dec)
        bucket.slots = {_sid_from_json(sid): slot for sid, slot in b["slots"]}
        bucket.free = list(b["free"])
        pool._buckets[(b["w"], b["h"])] = bucket
    return pool


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
