"""VLC table verification: full-table round trips + spot checks against
well-known spec values."""

import pytest

from h263_tpu.bitio import BitReader
from h263_tpu.types import MacroblockType
from h263_tpu.vlc_tables import (
    CBPY,
    CBPY_CODES,
    MCBPC_I,
    MCBPC_I_CODES,
    MCBPC_P,
    MCBPC_P_CODES,
    MODB,
    MODB_CODES,
    MVD,
    MVD_CODES,
    TCOEF,
    TCOEF_CODES,
    VLC_ESCAPE,
    VLC_INVALID,
    VLC_STUFFING,
)


def _bits_to_bytes(code: str) -> bytes:
    bits = code + "0" * ((8 - len(code) % 8) % 8)
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


@pytest.mark.parametrize("lut,codes", [
    (MCBPC_I, MCBPC_I_CODES),
    (MCBPC_P, MCBPC_P_CODES),
    (MODB, MODB_CODES),
    (CBPY, CBPY_CODES),
    (MVD, MVD_CODES),
    (TCOEF, TCOEF_CODES),
])
def test_full_table_roundtrip(lut, codes):
    """Every code decodes to its value and consumes exactly its length."""
    for code, value in codes:
        r = BitReader(_bits_to_bytes(code))
        assert r.read_vlc(lut) == value, code
        assert r.pos == len(code), code


def test_spot_checks_against_spec():
    # Table 8: I-picture MCBPC "1" = INTRA, CBPC 00.
    r = BitReader(_bits_to_bytes("1"))
    assert r.read_vlc(MCBPC_I) == (MacroblockType.INTRA, False, False)
    # Table 8: P-picture MCBPC "011" = INTER+Q, CBPC 00.
    r = BitReader(_bits_to_bytes("011"))
    assert r.read_vlc(MCBPC_P) == (MacroblockType.INTER_Q, False, False)
    # Stuffing is 000000001 in both tables.
    for lut in (MCBPC_I, MCBPC_P):
        r = BitReader(_bits_to_bytes("000000001"))
        assert r.read_vlc(lut) == VLC_STUFFING
    # Table 13: CBPY "11" = all four luma blocks coded (intra sense).
    r = BitReader(_bits_to_bytes("11"))
    assert r.read_vlc(CBPY) == (True, True, True, True)
    # Table 14: MVD "1" = 0; "010" = +0.5 px (1 half-pel); "011" = -0.5.
    assert BitReader(_bits_to_bytes("1")).read_vlc(MVD) == 0
    assert BitReader(_bits_to_bytes("010")).read_vlc(MVD) == 1
    assert BitReader(_bits_to_bytes("011")).read_vlc(MVD) == -1
    # Table 16: TCOEF "10" = (last=0, run=0, |level|=1); ESCAPE = 0000011.
    assert BitReader(_bits_to_bytes("10")).read_vlc(TCOEF) == (0, 0, 1)
    assert BitReader(_bits_to_bytes("0000011")).read_vlc(TCOEF) == VLC_ESCAPE
    # Long zero runs are invalid everywhere (they alias start codes).
    assert BitReader(_bits_to_bytes("0" * 9)).read_vlc(TCOEF) == VLC_INVALID
    assert BitReader(_bits_to_bytes("0" * 11)).read_vlc(MVD) == VLC_INVALID


def test_mvd_symmetry():
    """Positive/negative codes differ only in the final bit."""
    by_mag = {}
    for code, v in MVD_CODES:
        if isinstance(v, int) and v != 0:
            by_mag.setdefault(abs(v), {})[v > 0] = code
    for mag, d in by_mag.items():
        if mag == 32:
            continue  # -16.0 px has no positive counterpart (Table 14)
        assert d[True][:-1] == d[False][:-1]
        assert d[True][-1] == "0" and d[False][-1] == "1"


def test_tcoef_table_statistics():
    runs = [v for _, v in TCOEF_CODES if isinstance(v, tuple)]
    assert len(runs) == 102  # Table 16 has 102 (LAST,RUN,LEVEL) rows
    assert sum(1 for last, _, _ in runs if last) == 44
    # Kraft equality (complete code): sum 2^-len == 1 over all codes.
    assert sum(2 ** -len(c) for c, _ in TCOEF_CODES) == 1.0


@pytest.mark.parametrize("codes", [
    MCBPC_I_CODES, MCBPC_P_CODES, MODB_CODES, CBPY_CODES, MVD_CODES,
])
def test_kraft_equality(codes):
    assert sum(2 ** -len(c) for c, _ in codes) == 1.0
