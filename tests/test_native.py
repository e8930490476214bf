"""Native C++ front-end parity: symbol-for-symbol identical tensors vs the
Python parser across randomized streams (fuzz-style)."""

import numpy as np
import pytest

from h263_tpu.bitio import BitReader
from h263_tpu.native import ensure_built, parse_frame_native
from h263_tpu.parser.frame import parse_frame
from h263_tpu.parser.picture import decode_picture
from h263_tpu.testing.encoder import MBSpec, encode_sorenson_picture
from h263_tpu.types import DecoderOption, PictureOption, PictureTypeCode

SORENSON = DecoderOption.SORENSON_SPARK_BITSTREAM

pytestmark = pytest.mark.skipif(not ensure_built(),
                                reason="native toolchain unavailable")


def _parse_both(buf: bytes, decoder_options=SORENSON, prev=None):
    r1 = BitReader(buf)
    pic1 = decode_picture(r1, decoder_options, prev)
    w, h = pic1.format.width_and_height()
    running = pic1.options
    f_py = parse_frame(r1, pic1, decoder_options, running, w, h)

    r2 = BitReader(buf)
    pic2 = decode_picture(r2, decoder_options, prev)
    f_c, end_bit = parse_frame_native(buf, r2.pos, pic2, decoder_options,
                                      running, w, h)

    for field in ("coeffs_y", "class_y", "coeffs_cb", "class_cb",
                  "coeffs_cr", "class_cr", "mvs", "inter"):
        np.testing.assert_array_equal(
            getattr(f_c, field), getattr(f_py, field), err_msg=field)
    assert end_bit == r1.pos, "bit positions diverge"
    return f_py


def _random_mb(rng, kind_probs=(0.5, 0.4, 0.1), iframe=False):
    roll = rng.random()
    if iframe or roll < kind_probs[0]:
        blocks = []
        for _ in range(6):
            n = int(rng.integers(0, 6))
            evs, total = [], 0
            for _ in range(n):
                run = int(rng.integers(0, 8))
                if total + run + 1 > 64:
                    break
                lvl = int(rng.integers(1, 25)) * (1 if rng.random() < 0.5 else -1)
                evs.append((run, lvl))
                total += run + 1
            blocks.append(evs)
        return MBSpec(kind="intra",
                      intradc=[int(rng.integers(1, 128)) * 8 for _ in range(6)],
                      blocks=blocks,
                      dquant=int(rng.choice([0, 0, 0, -1, -2, 1, 2])))
    if roll < kind_probs[0] + kind_probs[1]:
        fourv = rng.random() < 0.3
        n_mv = 4 if fourv else 1
        mvd = [(int(rng.integers(-16, 16)), int(rng.integers(-16, 16)))
               for _ in range(n_mv)]
        blocks = []
        for _ in range(6):
            n = int(rng.integers(0, 4))
            evs, total = [], 0
            for _ in range(n):
                run = int(rng.integers(0, 12))
                if total + run + 1 > 64:
                    break
                lvl = int(rng.integers(1, 120)) * (1 if rng.random() < 0.5 else -1)
                evs.append((run, lvl))
                total += run + 1
            blocks.append(evs)
        return MBSpec(kind="inter", mvd=mvd, blocks=blocks,
                      dquant=int(rng.choice([0, 0, -1, 1])))
    return MBSpec(kind="uncoded")


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_iframe(seed):
    rng = np.random.default_rng(seed)
    w, h = int(rng.choice([16, 32, 48, 100])), int(rng.choice([16, 32, 62]))
    nmb = (-(-w // 16)) * (-(-h // 16))
    mbs = [_random_mb(rng, iframe=True) for _ in range(nmb)]
    buf = encode_sorenson_picture(w, h, PictureTypeCode.I_FRAME, mbs,
                                  quantizer=int(rng.integers(1, 32)),
                                  version=int(rng.choice([0, 1])))
    _parse_both(buf)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_pframe(seed):
    rng = np.random.default_rng(100 + seed)
    w, h = int(rng.choice([32, 64, 176])), int(rng.choice([32, 48, 144]))
    nmb = (-(-w // 16)) * (-(-h // 16))
    mbs = [_random_mb(rng) for _ in range(nmb)]
    buf = encode_sorenson_picture(w, h, PictureTypeCode.P_FRAME, mbs,
                                  quantizer=int(rng.integers(1, 32)),
                                  version=1)
    _parse_both(buf)


def test_truncated_frame_tail_fill():
    """A frame cut short must tail-fill identically in both front-ends."""
    mbs = [MBSpec(kind="intra", intradc=[800] * 6) for _ in range(4)]
    buf = encode_sorenson_picture(64, 16, PictureTypeCode.I_FRAME, mbs)
    # chop mid-macroblock
    for cut in (len(buf) - 1, len(buf) - 2, len(buf) // 2 + 4):
        truncated = buf[:cut]
        try:
            _parse_both(truncated)
        except Exception as e1:
            # both must fail the same way
            r = BitReader(truncated)
            pic = decode_picture(r, SORENSON, None)
            with pytest.raises(type(e1)):
                parse_frame_native(truncated, r.pos, pic, SORENSON,
                                   pic.options, 64, 16)


def test_stuffing_macroblocks():
    mbs = [MBSpec(kind="stuffing"),
           MBSpec(kind="intra", intradc=[512] * 6),
           MBSpec(kind="stuffing")]
    buf = encode_sorenson_picture(16, 16, PictureTypeCode.I_FRAME, mbs)
    f = _parse_both(buf)
    assert f.class_y[0, 0] == 1  # DC


def test_escape_widths_both_versions():
    for version in (0, 1):
        lvl = 100 if version == 0 else 900
        mbs = [MBSpec(kind="intra", intradc=[512] * 6,
                      blocks=[[(0, lvl)], [], [], [], [], []])]
        buf = encode_sorenson_picture(16, 16, PictureTypeCode.I_FRAME, mbs,
                                      version=version)
        _parse_both(buf)


def test_umv_wraparound_mvs():
    """MVs near the ±16px range boundary exercise halfpel_invert."""
    rng = np.random.default_rng(42)
    f0 = [MBSpec(kind="intra", intradc=[800] * 6) for _ in range(8)]
    # large positive MVDs that push out of range and wrap
    mbs = [MBSpec(kind="inter", mvd=[(int(rng.integers(20, 32)),
                                      int(rng.integers(-32, -20)))])
           for _ in range(8)]
    buf = encode_sorenson_picture(64, 32, PictureTypeCode.P_FRAME, mbs)
    _parse_both(buf)


class TestThreadedBatchParse:
    """The batch FFI loop parses streams on every host core; outputs and
    failure reporting must be independent of thread count/interleaving."""

    def _mk(self, n, monkeypatch, threads):
        monkeypatch.setenv("H263_TPU_PARSE_THREADS", str(threads))
        from h263_tpu.parallel.batch import BatchedStreamDecoder
        return BatchedStreamDecoder(n, 176, 144, SORENSON)

    def _corpus(self):
        rng = np.random.default_rng(3)
        mbs_i = [MBSpec(kind="intra",
                        intradc=[int(rng.integers(1, 120)) * 8] * 6,
                        blocks=[[(0, 5)], [], [(1, -3)], [], [], []])
                 for _ in range(11 * 9)]
        i_frame = encode_sorenson_picture(
            176, 144, PictureTypeCode.I_FRAME, mbs_i, quantizer=8)
        mbs_p = [MBSpec(kind="inter", mvd=[(2, -2)],
                        blocks=[[(1, 7)], [], [], [], [], []]
                        if k % 3 == 0 else [[], [], [], [], [], []])
                 for k in range(11 * 9)]
        p_frame = encode_sorenson_picture(
            176, 144, PictureTypeCode.P_FRAME, mbs_p, quantizer=8,
            temporal_reference=1)
        return [i_frame, p_frame]

    def test_outputs_identical_across_thread_counts(self, monkeypatch):
        corpus = self._corpus()
        results = {}
        for threads in (1, 3, 8):
            dec = self._mk(12, monkeypatch, threads)
            pk = dec._packed[0]
            dec.parse_batch_packed([corpus[0]] * 12, pk)
            first = (pk.u32.copy(), pk.mvs.copy(), pk.counts.copy())
            dec.parse_batch_packed([corpus[1]] * 12, pk)
            results[threads] = (first, pk.u32.copy(), pk.mvs.copy(),
                                pk.counts.copy())
        base = results[1]
        for threads in (3, 8):
            got = results[threads]
            for a, b in zip(base[0], got[0]):
                np.testing.assert_array_equal(a, b)
            np.testing.assert_array_equal(base[1], got[1])
            np.testing.assert_array_equal(base[2], got[2])
            np.testing.assert_array_equal(base[3], got[3])

    def test_failure_reports_lowest_stream_deterministically(self, monkeypatch):
        from h263_tpu.types import H263Error
        corpus = self._corpus()
        bufs = [corpus[0]] * 12
        bufs[4] = b"\x00\x00\x01\xff"  # garbage after start code
        bufs[9] = b"\x00\x00\x01\xff"
        for threads in (1, 8):
            dec = self._mk(12, monkeypatch, threads)
            with pytest.raises(H263Error) as ei:
                dec.parse_batch_packed(bufs, dec._packed[0])
            assert "stream 4" in str(ei.value)


def test_option_constants_match_python():
    """The OPPTYPE/MPPTYPE carry-forward masks compiled into entropy.cpp
    must equal types.py's (the native standard header path replicates the
    running-option merge)."""
    from h263_tpu.native import ensure_built
    if not ensure_built():
        pytest.skip("native front-end unavailable")
    from h263_tpu.native.bindings import native_option_masks
    from h263_tpu.types import MPPTYPE_OPTIONS, OPPTYPE_OPTIONS

    opp, mpp = native_option_masks()
    assert opp == int(OPPTYPE_OPTIONS)
    assert mpp == int(MPPTYPE_OPTIONS)


def test_differential_fuzz_campaign():
    """Structured-mutation differential fuzz (byte flips, truncations,
    splices, garbage tails) between the C++ and Python front-ends — a
    bounded run of the campaign in h263_tpu.testing.fuzz (the long form
    ran 8,250 cases / 0 mismatches in round 2)."""
    from h263_tpu.testing.fuzz import run_campaign

    failures = []
    total, fails = run_campaign(seed=20260816, n_base=15,
                                on_fail=lambda tag, why: failures.append((tag, why)))
    assert fails == 0, failures[:5]
    assert total == 15 * 11


def test_differential_fuzz_campaign_standard():
    """Standard (plain-PTYPE) flavor: 8-bit escapes + carried-UMV
    wraparound path, native vs Python front-ends."""
    from h263_tpu.testing.fuzz import run_campaign

    failures = []
    total, fails = run_campaign(seed=8, n_base=12, flavor="standard",
                                on_fail=lambda tag, why: failures.append((tag, why)))
    assert fails == 0, failures[:5]
    assert total == 12 * 11


def test_differential_fuzz_campaign_umv():
    """UMV table-D.3 flavor: PLUSPTYPE pictures with D.3-coded MVDs
    (large mantissas, INTER4V, EXTENDED and UNLIMITED ranges) through
    read_umv / read_umv_fast differentially."""
    from h263_tpu.testing.fuzz import run_campaign

    failures = []
    total, fails = run_campaign(seed=17, n_base=12, flavor="umv",
                                on_fail=lambda tag, why: failures.append((tag, why)))
    assert fails == 0, failures[:5]
    assert total == 12 * 11


def test_differential_fuzz_campaign_d24():
    """delta24 transport flavor (VERDICT r2 #7): native emit -> the
    production device decode (reconstruct.d24_to_posval) -> scatter-add,
    against the Python dense front-end.  The generator is biased at the
    transport's edges: gap>4095 advance-only escapes (long coefficient-free
    stretches), zigzag-overflow whole-block discard + pack-cursor rewind,
    both Sorenson escape widths.  An 11,000-case campaign (seeds 11-12,
    n_base=500 each) ran clean in round 3."""
    from h263_tpu.testing.fuzz import run_campaign

    failures = []
    total, fails = run_campaign(seed=3, n_base=12, flavor="d24",
                                on_fail=lambda tag, why: failures.append((tag, why)))
    assert fails == 0, failures[:5]
    assert total == 12 * 11


def test_differential_fuzz_campaign_fused():
    """Fused single-leaf transport flavor: randomized multi-step batch
    scenarios (random versions/quantizers/density, INTER4V flip steps,
    DisposableP, absent-slot masks, mid-GOP truncations and byte flips)
    through the production fused driver vs the legacy three-leaf d24
    transport; planes must be bit-identical per step and parse failures
    must agree on error class AND leave both paths steppable (atomicity)."""
    from h263_tpu.testing.fuzz import run_campaign

    failures = []
    total, fails = run_campaign(seed=31, n_base=4, flavor="fused",
                                on_fail=lambda tag, why: failures.append((tag, why)))
    assert fails == 0, failures[:5]
    assert total >= 4 * 6  # >= 6 steps per scenario


def test_excess_macroblock_predictor_bounds():
    """Regression (round 3, ASan-caught): macroblocks decoded past the
    picture's MB count (tolerated when uncoded / coefficient-free, matching
    the reference) must not run the spatial MV predictor — pctx.count keeps
    advancing while the predictor array holds only nmb rows, so the
    left-neighbour read preds[count-1] ran off the heap buffer (an
    unbounded OOB read; benign output-wise since excess MBs store nothing,
    but undefined behavior and a potential segfault).  Both front-ends must
    agree on these streams, through the dense AND the d24 transports."""
    from h263_tpu.testing.fuzz import _agree, _agree_d24
    from h263_tpu.types import PictureOption

    w = h = 48
    nmb = 9
    excess_inter = encode_sorenson_picture(
        w, h, PictureTypeCode.P_FRAME,
        [MBSpec(kind="inter", mvd=[(2, -2)])] * (nmb + 7),
        temporal_reference=1)
    excess_4v = encode_sorenson_picture(
        w, h, PictureTypeCode.P_FRAME,
        [MBSpec(kind="inter4v", mvd=[(1, 1), (2, -1), (-3, 2), (0, 1)])]
        * (nmb + 5), temporal_reference=2)
    for buf in (excess_inter, excess_4v):
        ok, why = _agree(buf, w, h,
                         DecoderOption.SORENSON_SPARK_BITSTREAM,
                         PictureOption.NONE)
        assert ok, why
        ok, why = _agree_d24(buf, w, h)
        assert ok, why


def test_native_build_readonly_install(monkeypatch, tmp_path):
    """A read-only install (site-packages) still builds the entropy
    library: regeneration + compile land in the fallback build dir, with
    the source copied next to the regenerated header so the quoted
    include resolves fresh.  (chmod can't simulate this under root — DAC
    override — so the writability checks are monkeypatched.)"""
    import os
    import shutil

    from h263_tpu.native import bindings

    pkg = tmp_path / "pkg"
    srcdir = pkg / "native"
    srcdir.mkdir(parents=True)
    real_dir = os.path.dirname(bindings.__file__)
    shutil.copyfile(os.path.join(real_dir, "entropy.cpp"),
                    srcdir / "entropy.cpp")
    shutil.copyfile(os.path.join(os.path.dirname(real_dir), "vlc_tables.py"),
                    pkg / "vlc_tables.py")
    # A stale shipped header forces regeneration.
    (srcdir / "tables.h").write_text("#error stale shipped header\n")
    os.utime(srcdir / "tables.h", (0, 0))

    build = tmp_path / "cache_build"
    monkeypatch.setattr(bindings, "_DIR", str(srcdir))
    monkeypatch.setattr(bindings, "_BUILD_DIR", str(build))
    monkeypatch.setattr(bindings, "_LIB_PATH",
                        str(build / "libh263entropy.so"))
    real_access = os.access
    monkeypatch.setattr(
        bindings.os, "access",
        lambda p, m, *a, **k: (False if str(p) == str(srcdir)
                               else real_access(p, m, *a, **k)))

    assert bindings._build()
    assert (build / "libh263entropy.so").exists()
    assert (build / "tables.h").exists()          # regenerated in fallback
    assert (build / "entropy.cpp").exists()       # compiled from the copy
    assert "stale" in (srcdir / "tables.h").read_text()  # untouched


def test_pick_build_dir_fallbacks(monkeypatch, tmp_path):
    """Unwritable package dir: a prebuilt library there is reused
    read-only; with no prebuilt library, the per-user cache dir wins."""
    import os

    from h263_tpu.native import bindings

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "xdg"))
    pkg_build = os.path.join(bindings._DIR, "build")
    pkg_lib = os.path.join(pkg_build, "libh263entropy.so")
    real_makedirs = os.makedirs

    def fake_makedirs(d, *a, **k):
        if str(d) == pkg_build:
            raise OSError(30, "Read-only file system")
        return real_makedirs(d, *a, **k)

    monkeypatch.setattr(bindings.os, "makedirs", fake_makedirs)
    if os.path.exists(pkg_lib):  # repo state: prebuilt lib -> reused as-is
        assert bindings._pick_build_dir() == pkg_build
    real_exists = os.path.exists
    monkeypatch.setattr(
        bindings.os.path, "exists",
        lambda p: False if str(p) == pkg_lib else real_exists(p))
    d = bindings._pick_build_dir()
    assert d == str(tmp_path / "xdg" / "h263_tpu" / "build")


def test_dequant_i16_wrap_parity():
    """rle.rs dequantizes in i16, which WRAPS for Sorenson v1 11-bit
    escape levels: quant=31, |L|=600 -> 31*1201 = 37231 -> i16 -28305 ->
    clamps to -2048 (NOT +2047).  All front-ends must replicate it."""
    from h263_tpu.parser.frame import parse_frame
    from h263_tpu.testing.fuzz import _agree, _agree_d24
    from h263_tpu.types import PictureOption

    f = encode_sorenson_picture(
        32, 32, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[1024] * 6,
                blocks=[[(0, 600)], [], [], [], [], []])]
        + [MBSpec(kind="intra", intradc=[1024] * 6)] * 3,
        quantizer=31, version=1)

    r = BitReader(f)
    pic = decode_picture(r, DecoderOption.SORENSON_SPARK_BITSTREAM, None)
    fd = parse_frame(r, pic, DecoderOption.SORENSON_SPARK_BITSTREAM,
                     pic.options, 32, 32)
    assert fd.coeffs_y[0, 0][0, 1] == -2048  # wrapped, sign flipped

    # Negative level wraps the other way: -600 -> +28305 -> clamp +2047.
    g = encode_sorenson_picture(
        32, 32, PictureTypeCode.I_FRAME,
        [MBSpec(kind="intra", intradc=[1024] * 6,
                blocks=[[(0, -600)], [], [], [], [], []])]
        + [MBSpec(kind="intra", intradc=[1024] * 6)] * 3,
        quantizer=31, version=1)
    r = BitReader(g)
    pic = decode_picture(r, DecoderOption.SORENSON_SPARK_BITSTREAM, None)
    fd = parse_frame(r, pic, DecoderOption.SORENSON_SPARK_BITSTREAM,
                     pic.options, 32, 32)
    assert fd.coeffs_y[0, 0][0, 1] == 2047

    # All front-ends agree (native + d24 transport vs Python).
    for buf in (f, g):
        ok, why = _agree(buf, 32, 32,
                         DecoderOption.SORENSON_SPARK_BITSTREAM,
                         PictureOption.NONE)
        assert ok, why
        ok, why = _agree_d24(buf, 32, 32)
        assert ok, why


def test_excess_coded_mb_rejected_uniformly():
    """ANY coded MB past the MB count is rejected (rle.rs:90 panics even
    for empty-CBP INTER MBs), by both front-ends with the same class."""
    from h263_tpu.testing.fuzz import _agree
    from h263_tpu.types import InvalidBitstream, PictureOption

    w = h = 48
    nmb = 9
    excess_empty = encode_sorenson_picture(
        w, h, PictureTypeCode.P_FRAME,
        [MBSpec(kind="inter", mvd=[(2, -2)])] * (nmb + 3),
        temporal_reference=1)
    r = BitReader(excess_empty)
    pic = decode_picture(r, DecoderOption.SORENSON_SPARK_BITSTREAM, None)
    with pytest.raises(InvalidBitstream):
        parse_frame(r, pic, DecoderOption.SORENSON_SPARK_BITSTREAM,
                    pic.options, w, h)
    ok, why = _agree(excess_empty, w, h,
                     DecoderOption.SORENSON_SPARK_BITSTREAM,
                     PictureOption.NONE)
    assert ok, why
