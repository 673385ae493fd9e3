"""PNG filter recon pinned against hand-derived spec vectors (VERDICT r6
task 6b).

The decoder's `_png_unfilter` and the test suite's roundtrips were written
from the same reading of the PNG spec — a shared-blind-spot risk (the
discipline that caught the round-6 URL and WAV bugs). This file pins the
five scanline filters against BYTE VECTORS computed by hand from RFC 2083
§6 / PNG spec §9 Recon functions (each expected byte derived on paper, in
the comments), with stdlib ``zlib`` building the container so only the
filter math is under test. The Paeth vector includes the a-vs-b
tie-priority case (pa == min, predictor must be ``a``), and a falsifier
shows a b-biased Paeth variant diverges on it — the vector discriminates,
it is not satisfied by every plausible implementation.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from kinesis_data_counter_spark.operators.multimodal import (
    _PNG_SIG,
    _png_chunk,
    decode_png,
)


def _png(w: int, h: int, color: int, scanlines: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scanlines))
        + _png_chunk(b"IEND", b"")
    )


def test_all_five_filters_recon_vectors():
    # grayscale 4x5, one row per filter; every recon byte derived by hand:
    # row0 Sub   f=[5,1,2,3]  -> 5, 5+1=6, 6+2=8, 8+3=11
    # row1 Up    f=[1,1,1,1]  -> 5+1=6, 6+1=7, 8+1=9, 11+1=12
    # row2 Avg   f=[4,2,2,2]  -> 4+((0+6)>>1)=7, 2+((7+7)>>1)=9,
    #                            2+((9+9)>>1)=11, 2+((11+12)>>1)=13
    # row3 Paeth f=[1,1,1,1]  -> i0: a=0,b=7,c=0, p=7, (pa,pb,pc)=(7,0,7)
    #                                -> b=7 -> 8
    #                            i1: a=8,b=9,c=7, p=10, (2,1,3) -> b -> 10
    #                            i2: a=10,b=11,c=9, p=12, (2,1,3) -> b -> 12
    #                            i3: a=12,b=13,c=11, p=14, (2,1,3) -> b -> 14
    # row4 None  f=[9,9,9,9]  -> 9,9,9,9
    raw = (
        b"\x01\x05\x01\x02\x03"
        b"\x02\x01\x01\x01\x01"
        b"\x03\x04\x02\x02\x02"
        b"\x04\x01\x01\x01\x01"
        b"\x00\x09\x09\x09\x09"
    )
    w, h, ch, px = decode_png(_png(4, 5, 0, raw))
    assert (w, h, ch) == (4, 5, 1)
    assert list(px) == [
        5, 6, 8, 11,
        6, 7, 9, 12,
        7, 9, 11, 13,
        8, 10, 12, 14,
        9, 9, 9, 9,
    ]


def test_sub_filter_uses_bpp_offset_not_one():
    # RGB (bpp=3): Sub's left neighbor is the byte bpp positions back —
    # a bpp=1 implementation would add the previous CHANNEL instead.
    # f=[10,20,30, 1,2,3] -> pixel0 (10,20,30); pixel1 (10+1, 20+2, 30+3)
    raw = b"\x01" + bytes([10, 20, 30, 1, 2, 3])
    w, h, ch, px = decode_png(_png(2, 1, 2, raw))
    assert (w, h, ch) == (2, 1, 3)
    assert list(px) == [10, 20, 30, 11, 22, 33]


# the Paeth tie vector: prev recon [10, 15]; current row filter 4.
#  i0: a=0, b=10, c=0  -> p=10, (pa,pb,pc)=(10,0,10) -> b=10
#      -> 246+10=256 & 0xFF = 0
#  i1: a=0, b=15, c=10 -> p=5, (pa,pb,pc)=(5,10,5): pa TIES pc and a wins
#      (spec priority: a when pa<=pb AND pa<=pc) -> a=0 -> 7+0=7
#      a strict-< variant falls through to c=10 -> 17
_PAETH_TIE_RAW = b"\x00\x0a\x0f" + b"\x04\xf6\x07"


def test_paeth_a_priority_tie_vector():
    w, h, ch, px = decode_png(_png(2, 2, 0, _PAETH_TIE_RAW))
    assert (w, h, ch) == (2, 2, 1)
    assert list(px) == [10, 15, 0, 7]


def test_paeth_tie_vector_discriminates_strict_lt_variant():
    # falsifier: run the same scanlines through a deliberately-wrong Paeth
    # that uses strict < for the a-condition (so pa==pc ties fall through
    # to c). It must produce DIFFERENT pixels — proving the vector above
    # pins the spec's tie order, not just "some Paeth".
    def unfilter_strict_lt(raw: bytes, w: int, h: int) -> list[int]:
        out: list[int] = []
        prev = [0] * w
        pos = 0
        for _ in range(h):
            ft = raw[pos]
            pos += 1
            row = list(raw[pos : pos + w])
            pos += w
            if ft == 4:
                for i in range(w):
                    a = row[i - 1] if i else 0
                    b = prev[i]
                    c = prev[i - 1] if i else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    # WRONG: strict <, so the pa==pc tie goes to c
                    pr = a if (pa < pb and pa < pc) else (b if pb <= pc else c)
                    row[i] = (row[i] + pr) & 0xFF
            elif ft != 0:
                raise ValueError(ft)
            out += row
            prev = row
        return out

    wrong = unfilter_strict_lt(_PAETH_TIE_RAW, 2, 2)
    _, _, _, spec = decode_png(_png(2, 2, 0, _PAETH_TIE_RAW))
    assert wrong != list(spec)
    assert wrong == [10, 15, 0, 17]  # the divergence is exactly the tie


def test_average_floor_division_not_round():
    # Average uses floor((a+b)/2); a rounding implementation differs on
    # odd sums. prev=[0], row Avg f=[5] then f=[3] over prev 5:
    #  row0: 5 + ((0+0)>>1) = 5 ; row1: 3 + ((0+5)>>1) = 3+2 = 5 (not 6)
    raw = b"\x03\x05" + b"\x03\x03"
    _, _, _, px = decode_png(_png(1, 2, 0, raw))
    assert list(px) == [5, 5]
