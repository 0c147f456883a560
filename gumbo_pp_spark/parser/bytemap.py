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


def _char_starts_slow(raw: bytes, n_chars: int) -> np.ndarray:
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
