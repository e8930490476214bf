"""The `python -m h263_tpu` CLI: decode / info / selftest.

The reference has no CLI (it is a library for Ruffle); this covers the
host-application jobs the CLI packages up — demux, decode-to-files,
header probing (the parser::decode_picture sniffing use case,
h263/src/lib.rs:11) — over the independent ffmpeg fixture corpus.
"""

import io
import pathlib

import numpy as np
import pytest

from h263_tpu.__main__ import main
from h263_tpu.io.flv import iter_flv_video_tags

FIX = pathlib.Path(__file__).parent / "fixtures"
QCIF = FIX / "ffmpeg_flv1_qcif.flv"


def test_selftest():
    assert main(["selftest"]) == 0


def test_decode_ppm(tmp_path, capsys):
    assert main(["decode", str(QCIF), "-o", str(tmp_path),
                 "--max-frames", "3"]) == 0
    out = capsys.readouterr().out
    assert "decoded 3 frames" in out
    ppms = sorted(tmp_path.glob("frame_*.ppm"))
    assert len(ppms) == 3
    header = ppms[0].read_bytes()[:20]
    assert header.startswith(b"P6\n176 144\n255\n")


def test_decode_ppm_matches_golden_luma(tmp_path):
    """The CLI's first decoded frame agrees with the ffmpeg golden: its
    PPM red channel is BT.601 of our planes, so compare our own luma
    against the fixture's stored luma envelope instead (exactly the
    corpus-test contract, through the CLI path)."""
    assert main(["decode", str(QCIF), "-o", str(tmp_path),
                 "--fmt", "npz", "--max-frames", "1"]) == 0
    g = np.load(FIX / "ffmpeg_flv1_qcif_golden.npz")
    got = np.load(tmp_path / "frames.npz")
    ours = got["y_00000"].astype(np.int16)
    ref = g["luma"][0].astype(np.int16)
    assert np.abs(ours - ref).max() <= 1


def test_decode_raw_elementary_stream(tmp_path, capsys):
    """Concatenated picture payloads (no FLV container) go through the
    FrameSegmenter path."""
    data = QCIF.read_bytes()
    raw = b"".join(t.payload for t in iter_flv_video_tags(data))
    p = tmp_path / "raw.h263"
    p.write_bytes(raw)
    assert main(["decode", str(p), "--max-frames", "2"]) == 0
    assert "decoded 2 frames" in capsys.readouterr().out


def test_info(capsys):
    assert main(["info", str(QCIF), "--max-frames", "5"]) == 0
    out = capsys.readouterr().out
    lines = [l for l in out.splitlines() if l.startswith("picture")]
    assert len(lines) == 5
    assert "I" in lines[0] and "176x144" in lines[0]
    assert out.strip().splitlines()[-1].startswith("5 pictures")


def test_decode_error_reporting(tmp_path, capsys):
    """Garbage input: no frames, non-zero exit, error on stderr."""
    p = tmp_path / "bad.flv"
    # Valid FLV wrapper, corrupt video payload (a PSC then junk).
    body = bytes([0x10 | 2]) + b"\x00\x00\x80" + b"\xff" * 8
    tag = bytes([9]) + len(body).to_bytes(3, "big") + b"\x00" * 7 + body
    p.write_bytes(b"FLV\x01\x01\x00\x00\x00\x09\x00\x00\x00\x00" + tag
                  + (11 + len(body)).to_bytes(4, "big"))
    rc = main(["decode", str(p), "-o", str(tmp_path / "out")])
    captured = capsys.readouterr()
    assert rc == 1
    assert "error" in captured.err


def test_info_handles_reserved_format(tmp_path, capsys):
    """A reserved source format must print '?x?', not crash the probe."""
    from h263_tpu.testing.encoder import BitWriter

    w = BitWriter()
    w.write_bits(1, 17)      # PSC
    w.write_bits(0, 5)       # GN
    w.write_bits(0, 8)       # TR
    w.write_code("10000")    # PTYPE intro
    w.write_bits(6, 3)       # source format 6: RESERVED
    w.write_bits(1, 1)       # I (parity convention)
    w.write_bits(0, 4)       # umv/sac/ap/pb off
    w.write_bits(8, 5)       # quant
    w.write_bits(0, 1)       # CPM
    w.write_bits(0, 1)       # PEI
    p = tmp_path / "reserved.263"
    p.write_bytes(w.to_bytes())
    main(["info", str(p), "--standard"])
    out = capsys.readouterr().out
    assert "?x?" in out


def test_max_frames_zero_decodes_nothing(tmp_path, capsys):
    assert main(["decode", str(QCIF), "-o", str(tmp_path),
                 "--max-frames", "0"]) == 0
    assert "decoded 0 frames" in capsys.readouterr().out
    assert not list(tmp_path.glob("frame_*.ppm"))
