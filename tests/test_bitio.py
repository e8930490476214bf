"""BitReader semantics: MSB-first reads, sign extension, start codes, UMV."""

import pytest

from h263_tpu.bitio import BitReader
from h263_tpu.types import BitstreamExhausted


def test_read_unaligned_bits():
    r = BitReader(bytes([0xFF, 0x72, 0x1C, 0x1F]))
    assert r.read_bits(3) == 0x7
    assert r.read_bits(6) == 0x3E
    assert r.read_bits(23) == 0x721C1F
    with pytest.raises(BitstreamExhausted):
        r.read_bits(1)


def test_read_signed_bits():
    r = BitReader(bytes([0xFF, 0x40, 0x72, 0x1C, 0x1F]))
    assert r.read_signed_bits(3) == -1
    assert r.read_signed_bits(6) == -2
    assert r.read_signed_bits(8) == -0x80
    assert r.read_signed_bits(23) == -0xDE3E1
    with pytest.raises(BitstreamExhausted):
        r.read_bits(1)


def test_peek_does_not_advance():
    r = BitReader(bytes([0xFF, 0x72, 0x1C, 0x1F]))
    assert r.peek_bits(3) == 0x7
    assert r.peek_bits(6) == 0x3F
    assert r.peek_bits(23) == 0x7FB90E
    with pytest.raises(BitstreamExhausted):
        r.peek_bits(64)


def test_read_u8_unaligned():
    r = BitReader(bytes([0xFE, 0x73, 0xF3]))
    r.skip_bits(2)
    assert r.read_u8() == 0xF9
    assert r.read_u8() == 0xCF
    with pytest.raises(BitstreamExhausted):
        r.read_u8()


def test_aligned_start_code():
    r = BitReader(bytes([0x00, 0x00, 0x80, 0x00]))
    assert r.recognize_start_code(False) == 0


def test_stuffed_start_code_respects_realignment():
    r = BitReader(bytes([0x00, 0x00, 0x08, 0x00]))
    assert r.recognize_start_code(False) is None
    r.skip_bits(1)
    assert r.recognize_start_code(False) == 3


def test_resynchronize_in_error_mode():
    r = BitReader(bytes([0x13, 0x80, 0x00, 0x40, 0x00]))
    assert r.recognize_start_code(True) == 9


def test_umv_zero_and_values():
    # '1' => 0
    r = BitReader(bytes([0b10000000]))
    assert r.read_umv() == 0
    # '0' then ('00') => +1  (bulk=1, mantissa=0)
    r = BitReader(bytes([0b00000000]))
    assert r.read_umv() == 1
    # '0' then '10' => -1
    r = BitReader(bytes([0b01000000]))
    assert r.read_umv() == -1
    # '0' '11' '00' => mantissa=1,bulk=2 => +3
    r = BitReader(bytes([0b01100000]))
    assert r.read_umv() == 3
    # '0' '01' '10' => mantissa=0<<1=0, bulk=2 => -2
    r = BitReader(bytes([0b00110000]))
    assert r.read_umv() == -2


def test_transaction_rollback():
    r = BitReader(bytes([0xAB, 0xCD]))

    def fail(rr):
        rr.read_bits(7)
        raise ValueError()

    with pytest.raises(ValueError):
        r.with_transaction(fail)
    assert r.pos == 0
    assert r.read_u8() == 0xAB


def test_start_code_one_past_alignment_accepted():
    """reader.rs:246 bails at skip > max_skip AFTER peeking offset `skip`,
    so a start code up to max_skip+1 bits ahead is accepted — including
    1 bit ahead at an already byte-aligned position (max_skip=0)."""
    # bit 0 = '0', bits 1..17 = the 17-bit start code.
    r = BitReader(b"\x00\x00\x40\x00")
    assert r.realignment_bits() == 0
    assert r.recognize_start_code() == 1
    # Two bits ahead exceeds max_skip+1 at an aligned position: rejected.
    r2 = BitReader(b"\x00\x00\x20\x00")
    assert r2.recognize_start_code() is None
    # Unaligned: code at realignment_bits()+1 still accepted.
    r3 = BitReader(b"\x00\x00\x00\x40\x00")
    r3.read_bits(3)
    assert r3.realignment_bits() == 5
    # code's '1' lands at bit 25: 6 bits ahead of pos 3 == max_skip+1
    assert r3.recognize_start_code() == 6
