"""Decoded-offset → raw-byte-offset mapping for span emission.

Gumbo's node offsets are BYTE offsets into the raw source buffer
(reference ``gumbo_util.h:121-146``; ``original_tag`` slices in
``gumbo_text.h:60-108`` operate on the input bytes).  The engine
parses the *decoded* (UTF-8 → str) and *newline-normalized*
(``\\r\\n``/``\\r`` → ``\\n``, WHATWG input-stream preprocessing)
string, so its internal offsets index that string.  This module builds
the exact per-position mapping back to raw bytes so the output
contract can carry true byte offsets — a consumer slicing the original
``html`` binary of a non-ASCII or CRLF page gets the right bytes.

Construction is vectorized for the overwhelming common case:

* pure-ASCII, no CR  →  identity (represented as ``None``, zero cost);
* valid UTF-8        →  char starts are exactly the non-continuation
  bytes (``b & 0xC0 != 0x80``), one numpy pass;
* invalid UTF-8      →  byte-at-a-time incremental decode (rare; only
  pages where ``decode(errors='replace')`` produced U+FFFD and the
  start-byte count disagrees with the decoded length).  Within an
  ill-formed subsequence the attribution is best-effort (first
  replacement char gets the subsequence start; later chars in the same
  flush get the completing byte) — valid regions stay exact.

CR normalization: a collapsed ``\\r\\n`` maps the surviving ``\\n`` to
the byte offset of the ``\\r`` (the WHATWG preprocessor replaces the
PAIR, so the normalized char begins where the pair began).
"""

from __future__ import annotations

import codecs

import numpy as np


def _char_starts_valid(raw: bytes) -> np.ndarray:
    b = np.frombuffer(raw, dtype=np.uint8)
    return np.nonzero((b & 0xC0) != 0x80)[0].astype(np.int64)


def _char_starts_bytewise(raw: bytes, n_chars: int) -> np.ndarray:
    """Reference implementation: byte-at-a-time incremental decode.
    Defines the attribution contract; kept for the equivalence tests
    (``_char_starts_slow`` must map identically) and as documentation
    of the semantics the chunked version reproduces."""
    dec = codecs.getincrementaldecoder("utf-8")("replace")
    out = np.empty(n_chars, dtype=np.int64)
    pos = 0
    last_flush = 0
    for bi in range(len(raw)):
        got = dec.decode(raw[bi : bi + 1])
        if got:
            out[pos] = last_flush
            for k in range(1, len(got)):
                out[pos + k] = bi
            pos += len(got)
            last_flush = bi + 1
    tail = dec.decode(b"", final=True)
    for k in range(len(tail)):
        out[pos + k] = last_flush
    pos += len(tail)
    if pos != n_chars:  # defensive: mapping must cover every char
        raise ValueError(f"byte-map length mismatch: {pos} != {n_chars}")
    return out


_PROBE_MIN = 1 << 8   # adaptive probe window: small near invalid
_PROBE_MAX = 1 << 16  # regions (slice copy is O(window)), grows on
                      # consecutive clean probes for long valid runs


def _char_starts_slow(raw: bytes, n_chars: int) -> np.ndarray:
    """Chunked equivalent of :func:`_char_starts_bytewise`: valid
    UTF-8 runs are consumed in bulk with O(1) bookkeeping per run
    (char counts from a global non-continuation prefix sum), and the
    incremental decoder steps byte-at-a-time ONLY through ill-formed
    subsequences.  CC-scale pages are mojibake-rich — a 1 MB page with
    scattered invalid bytes cost ~1M Python loop iterations in the
    bytewise version, vs ~(number of invalid regions) probe/step
    cycles plus three vectorized passes here.

    Equivalence argument (pinned by ``test_bytemap.py`` equivalence
    tests): over a maximal valid run entered with a CLEAN decoder,
    byte-at-a-time feeding flushes exactly one char per final byte, so
    every char maps to its start byte — identical to the global
    non-continuation scan.  Around an ill-formed subsequence the
    bytewise attribution depends on WHEN the incremental decoder
    flushes (a replacement may flush together with, or one byte into,
    the following valid char), so the chunked version keeps stepping
    single bytes until the decoder's internal buffer is empty again,
    reproducing those flush-boundary quirks exactly, then resumes bulk
    runs.  Bulk-run attributions are filled AFTER the segmentation
    loop in one vectorized pass: both the unclaimed output slots and
    the bulk char starts ascend in the same global order, so a single
    masked assignment aligns them."""
    n = len(raw)
    out = np.empty(n_chars, dtype=np.int64)
    stepped = np.zeros(n_chars, dtype=bool)  # slots written by the decoder
    b = np.frombuffer(raw, dtype=np.uint8)
    is_start = (b & 0xC0) != 0x80
    cum = np.empty(n + 1, dtype=np.int64)
    cum[0] = 0
    np.cumsum(is_start, out=cum[1:])
    bulk_diff = np.zeros(n + 1, dtype=np.int32)  # diff-marks of bulk runs
    pos = 0
    i = 0
    dec = codecs.getincrementaldecoder("utf-8")("replace")
    last_flush = 0
    probe = _PROBE_MIN
    while i < n:
        probe_end = min(n, i + probe)
        inv_end = None
        reason = ""
        try:
            raw[i:probe_end].decode("utf-8")
            ve = probe_end
            probe = min(_PROBE_MAX, probe * 8)
        except UnicodeDecodeError as e:
            if e.reason == "unexpected end of data" and probe_end < n:
                # the probe window cut a (so far valid) char at its
                # end — not a real error; a char is <= 4 bytes and the
                # window is larger, so e.start > 0 always progresses
                ve = i + e.start
            else:
                ve = i + e.start
                inv_end = i + e.end
                reason = e.reason
                probe = _PROBE_MIN
        if ve > i:
            bulk_diff[i] += 1
            bulk_diff[ve] -= 1
            pos += int(cum[ve] - cum[i])
            i = ve
            last_flush = ve
        if inv_end is not None:
            # One ill-formed subsequence = one replacement char.  A
            # lone invalid START byte (0xF5-0xFF, 0xC0/0xC1, stray
            # continuation — the common mojibake) flushes its
            # replacement immediately on feed, so its attribution is
            # exactly '�' at the region start (= last_flush): O(1), no
            # decoder.  Every OTHER reason byte-steps the incremental
            # decoder, because CPython may BUFFER a truncated/rejected
            # prefix across feeds (e.g. the \xed surrogate-prefix
            # family defers its reject to the next byte), which shifts
            # the flush boundary — and with it the attribution of the
            # replacement AND of the following char.
            if reason != "invalid start byte":
                while i < n:
                    got = dec.decode(raw[i : i + 1])
                    if got:
                        out[pos] = last_flush
                        stepped[pos] = True
                        for k in range(1, len(got)):
                            out[pos + k] = i
                            stepped[pos + k] = True
                        pos += len(got)
                        last_flush = i + 1
                    i += 1
                    if i >= inv_end and dec.getstate()[0] == b"":
                        break
            else:
                out[pos] = last_flush
                stepped[pos] = True
                pos += 1
                i = inv_end
                last_flush = inv_end
    tail = dec.decode(b"", final=True)
    for k in range(len(tail)):
        out[pos + k] = last_flush
        stepped[pos + k] = True
    pos += len(tail)
    if pos != n_chars:  # defensive: mapping must cover every char
        raise ValueError(f"byte-map length mismatch: {pos} != {n_chars}")
    in_bulk = np.cumsum(bulk_diff[:n]) > 0
    sel = np.nonzero(is_start & in_bulk)[0].astype(np.int64)
    free = ~stepped
    if len(sel) != int(free.sum()):  # pragma: no cover - invariant
        raise ValueError("byte-map bulk/stepped split mismatch")
    out[free] = sel
    return out


def build_byte_map(raw: bytes, prenorm: str, normalized_len: int) -> np.ndarray | None:
    """Byte offset of every position of the normalized decoded string,
    plus one trailing entry = ``len(raw)`` (so end offsets gather too).
    Returns ``None`` for the identity mapping (ASCII, no CR)."""
    n0 = len(prenorm)
    if n0 == normalized_len and n0 == len(raw):
        return None  # 1 byte per char and nothing collapsed
    starts = _char_starts_valid(raw)
    if len(starts) != n0:
        starts = _char_starts_slow(raw, n0)
    if n0 != normalized_len:
        # drop the '\n' of every '\r\n' pair: the normalized positions
        # are the prenorm positions minus those, and the surviving
        # newline inherits the '\r' start
        cp = np.frombuffer(prenorm.encode("utf-32-le"), dtype=np.uint32)
        drop = np.empty(n0, dtype=bool)
        drop[0] = False
        np.logical_and(cp[1:] == 10, cp[:-1] == 13, out=drop[1:])
        starts = starts[~drop]
        if len(starts) != normalized_len:  # pragma: no cover - invariant
            raise ValueError("CR-normalization byte-map mismatch")
    return np.append(starts, len(raw))
