"""Byte-offset span contract (gumbo_util.h:121-146 byte-offset model):
``NodeTable.byte_offsets`` maps decoded/normalized offsets back to raw
``html`` bytes, so slicing the ORIGINAL bytes reproduces a span's raw
source even on non-ASCII / CRLF / invalid-UTF-8 pages."""

import numpy as np
import pytest

from gumbo_pp_spark.nodetable import TEXT
from gumbo_pp_spark.parser.bytemap import build_byte_map
from gumbo_pp_spark.parser.html5 import parse_html


def text_slices(raw: bytes):
    nt = parse_html(raw)
    out = []
    for i in range(nt.n):
        if nt.type[i] == TEXT:
            b0 = int(nt.byte_offsets(int(nt.src_start[i])))
            b1 = int(nt.byte_offsets(int(nt.src_end[i])))
            out.append((nt.text[i], raw[b0:b1]))
    return nt, out


class TestByteMap:
    def test_ascii_identity(self):
        nt = parse_html(b"<p>plain ascii</p>")
        assert (nt.byte_offsets(np.array([0, 5])) == [0, 5]).all()
        assert nt._byte_map is None  # identity, zero-cost

    def test_utf8_crlf_roundtrip(self):
        raw = (
            "<html><head><title>Béta</title></head>\r\n<body>\r\n"
            "<p>héllo €\r\nwörld</p>\r\n<div>café \U0001F600</div>"
            "</body></html>"
        ).encode()
        _, slices = text_slices(raw)
        decoded = {t: s for t, s in slices}
        # raw slice carries the ORIGINAL CRLF bytes; decoding +
        # normalizing it reproduces the text node exactly
        assert decoded["héllo €\nwörld"] == "héllo €\r\nwörld".encode()
        assert decoded["café \U0001F600"] == "café \U0001F600".encode()
        for t, s in slices:
            assert s.decode("utf-8").replace("\r\n", "\n") == t

    def test_two_three_four_byte_chars(self):
        raw = "<p>é€\U0001F600x</p>".encode()
        _, slices = text_slices(raw)
        assert slices[0][1] == "é€\U0001F600x".encode()
        # 4-byte char advances the byte map by 4
        nt = parse_html(raw)
        starts = nt.byte_offsets(np.arange(len(nt.source) + 1))
        assert starts[-1] == len(raw)
        assert (np.diff(starts) >= 1).all()

    def test_invalid_utf8_fallback(self):
        raw = b"<p>ok\xff\xfe then \xc2 more</p>"
        nt, slices = text_slices(raw)
        # whole text node maps back onto the exact raw byte range
        assert slices[0][1] == b"ok\xff\xfe then \xc2 more"
        assert "�" in slices[0][0]

    def test_lone_continuation_bytes(self):
        # lone continuation bytes break the vectorized start counting
        # → exercises the incremental-decoder fallback
        raw = b"<p>a\x80\x80b</p>"
        _, slices = text_slices(raw)
        assert slices[0][1] == b"a\x80\x80b"

    def test_lone_cr_positions_unchanged(self):
        raw = b"<p>a\rb</p>"
        nt, slices = text_slices(raw)
        assert nt.source.count("\n") == 1  # normalized in place
        assert slices[0][1] == b"a\rb"  # same positions, raw CR bytes

    def test_str_input_maps_onto_utf8_encoding(self):
        nt = parse_html("<p>str é\r\nx</p>")
        i = next(k for k in range(nt.n) if nt.type[k] == TEXT)
        b0 = int(nt.byte_offsets(int(nt.src_start[i])))
        b1 = int(nt.byte_offsets(int(nt.src_end[i])))
        assert nt.raw[b0:b1] == "str é\r\nx".encode()

    def test_build_byte_map_direct(self):
        raw = "aé\r\nb".encode()
        prenorm = raw.decode()
        norm = prenorm.replace("\r\n", "\n")
        bm = build_byte_map(raw, prenorm, len(norm))
        # positions: a=0, é=1(2 bytes), \n(was \r at byte 3), b=5, end=6
        assert bm.tolist() == [0, 1, 3, 5, 6]

    def test_mismatched_map_raises(self):
        with pytest.raises(ValueError):
            from gumbo_pp_spark.parser.bytemap import _char_starts_slow

            _char_starts_slow(b"ab", 5)


class TestChunkedSlowPathEquivalence:
    """The chunked slow path must map IDENTICALLY to the bytewise
    reference — including the flush-boundary quirks around ill-formed
    subsequences (a replacement char may flush one byte into the next
    valid char, shifting that char's attribution)."""

    def _both(self, raw: bytes):
        from gumbo_pp_spark.parser.bytemap import (
            _char_starts_bytewise,
            _char_starts_slow,
        )

        n_chars = len(raw.decode("utf-8", errors="replace"))
        ref = _char_starts_bytewise(raw, n_chars)
        got = _char_starts_slow(raw, n_chars)
        assert got.tolist() == ref.tolist(), raw
        return got

    def test_flush_boundary_quirk_truncated_before_valid(self):
        # \xe2 (truncated) then € : the replacement flushes while the
        # decoder already buffers the next char's first byte, so '€'
        # is attributed to byte 2 (last_flush), not its true start 1 —
        # the chunked version must reproduce this exactly
        m = self._both(b"\xe2\xe2\x82\xac")
        assert m.tolist() == [0, 2]

    def test_lone_continuations_runs(self):
        self._both(b"a\x80\x80\x80b")
        self._both(b"\x80" * 7 + b"xyz")
        self._both(b"x" * 5 + b"\x80" * 4)

    def test_invalid_families(self):
        for bad in (
            b"\xff",
            b"\xfe\xff",
            b"\xc2",            # truncated 2-byte at EOF
            b"\xe2\x82",        # truncated 3-byte at EOF
            b"\xf0\x9f\x98",    # truncated 4-byte at EOF
            b"\xf4\x90\x80\x80",  # > U+10FFFF
            b"\xc0\xaf",        # overlong
            b"\xed\xa0\x80",    # surrogate
        ):
            self._both(b"ab" + bad + "é€\U0001f600z".encode())
            self._both(bad + b"tail")
            self._both(b"head" + bad)

    def test_scattered_invalid_random(self):
        import random

        rng = random.Random(42)
        base = "paragraph é € \U0001f600 ퟿ text ".encode() * 40
        for _ in range(50):
            b = bytearray(base)
            for _k in range(rng.randrange(1, 12)):
                # full high-byte range: \xed prefixes exercise
                # CPython's deferred-reject buffering
                b[rng.randrange(len(b))] = rng.randrange(0x80, 0x100)
            self._both(bytes(b))

    def test_dense_mojibake_equivalence(self):
        # pathological density — every ~10th byte invalid; the chunked
        # path must still map identically (it degrades to byte-stepping
        # plus O(1) naive regions, never to a wrong answer)
        import random

        rng = random.Random(9)
        b = bytearray(("dense é€\U0001f600 page " * 200).encode())
        for _ in range(len(b) // 10):
            b[rng.randrange(len(b))] = rng.randrange(0x80, 0x100)
        self._both(bytes(b))

    def test_probe_window_boundaries(self):
        from gumbo_pp_spark.parser import bytemap

        # run crossing the probe window, with a 4-byte char straddling
        # the boundary and an invalid byte shortly after
        for w in (bytemap._PROBE_MIN, bytemap._PROBE_MAX):
            raw = (
                b"a" * (w - 2)
                + "\U0001f600".encode()
                + b"\xff"
                + "é".encode() * 3
            )
            self._both(raw)
