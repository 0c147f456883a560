"""Micro-bench: chunked vs bytewise byte-map construction
(parser/bytemap.py:42 `_char_starts_bytewise` reference walk vs
:73 `_char_starts_slow` chunked bulk-run path).

The round-3 verdict asked for a measured >=10x on a ~1 MB
90%-valid-UTF-8 page; equivalence is separately pinned by
tests/test_bytemap.py.  Run standalone (never concurrently with
bench.py):  python BENCH/bytemap_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gumbo_pp_spark.parser.bytemap import _char_starts_bytewise, _char_starts_slow


def make_page(size: int, invalid_every: int, seed: int = 7) -> bytes:
    """ASCII text + multibyte runs with a stray invalid byte every
    ``invalid_every`` bytes (mojibake-style page)."""
    rng = np.random.default_rng(seed)
    out = bytearray()
    words = [b"lorem ", b"ipsum ", "é".encode(), "漢".encode(), b"dolor "]
    while len(out) < size:
        out += words[int(rng.integers(0, len(words)))]
        if invalid_every and len(out) % invalid_every < 6:
            out += bytes([0xC3])  # lone continuation-starter: invalid
    return bytes(out)


def run(label: str, raw: bytes, reps: int = 3) -> None:
    n_chars = len(raw.decode("utf-8", "replace"))
    # warm both paths once: this VM's first-touch page faults / cold
    # CPU cost ~100x on the first numpy pass (memory: sandbox-vm-noise)
    a = _char_starts_slow(raw, n_chars)
    b = _char_starts_bytewise(raw, n_chars)
    assert np.array_equal(a, b), label
    t_chunked = min(
        _timed(lambda: _char_starts_slow(raw, n_chars)) for _ in range(reps)
    )
    t_bytewise = min(
        _timed(lambda: _char_starts_bytewise(raw, n_chars)) for _ in range(reps)
    )
    print(
        f"{label}: chunked {t_chunked * 1e3:.1f} ms, bytewise "
        f"{t_bytewise * 1e3:.1f} ms -> {t_bytewise / t_chunked:.1f}x"
    )


def _timed(f) -> float:
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    run("1MB ~90% valid (sparse invalid)", make_page(1 << 20, 4096))
    run("1MB fully valid multibyte", make_page(1 << 20, 0))
    run("1MB pathological (invalid every 64B)", make_page(1 << 20, 64))
