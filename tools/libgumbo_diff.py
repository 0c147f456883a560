"""libgumbo differential harness (VERDICT r6 #8 — environment-bound).

Replays a corpus through the REAL libgumbo (via tools/libgumbo_shim.c)
and through this repo's ``parse_html``, diffing trees, text, byte
spans, and error counts.  The sandbox this engine was built in has no
libgumbo (and no network), so fidelity is pinned against the vendored
html5lib oracle (tests/conformance); this script is the day-one job
wherever the real library exists — the reference's own parse semantics
ARE libgumbo (reference src/gumbo_pp.cpp:29-31, vcpkg.json:5-7).

Usage:
    gcc -O2 tools/libgumbo_shim.c -o /tmp/libgumbo_shim -lgumbo
    python tools/libgumbo_diff.py --shim /tmp/libgumbo_shim \
        [--corpus tests/conformance/cases.txt] [--max N] [--verbose]

Exit 0 = no divergences; 1 = divergences printed (first 20 with the
reduced source); 2 = harness/setup error.

Known, documented mapping notes (see COVERAGE.md "Known divergences"):
* implied elements: libgumbo emits an EMPTY original_tag (start==end==
  the data pointer's position is absent → shim prints -1); the engine
  emits a zero-length span at the insertion offset.  The comparator
  treats (-1, -1) as equal to any zero-length engine span.
* the engine's WHITESPACE/TEXT split follows the spec's insertion
  modes exactly as libgumbo does; any split difference IS a
  divergence and should be reported.
* error RECORDS are engine-taxonomy-specific on both sides; only the
  COUNT is compared (the engine's per-record codes are pinned against
  html5lib separately).
"""

from __future__ import annotations

import argparse
import subprocess
import sys

REPO = __file__.rsplit("/tools/", 1)[0]
sys.path.insert(0, REPO)


def _engine_lines(data: bytes) -> list[str]:
    """parse_html → the shim's line format (byte offsets)."""
    from gumbo_pp_spark.nodetable import (
        CDATA, COMMENT, DOCUMENT, ELEMENT, TEMPLATE, TEXT, WHITESPACE,
    )
    from gumbo_pp_spark.parser.html5 import parse_html

    nt = parse_html(data)
    t0b = nt.byte_offsets(nt.tag_start)
    t1b = nt.byte_offsets(nt.tag_end)
    s0b = nt.byte_offsets(nt.src_start)
    s1b = nt.byte_offsets(nt.src_end)
    tyname = {DOCUMENT: "doc", ELEMENT: "elem", TEMPLATE: "template",
              TEXT: "text", WHITESPACE: "ws", CDATA: "cdata", COMMENT: "comment"}

    def esc(s: str) -> str:
        out = []
        for ch in s.encode("utf-8", "surrogatepass"):
            if ch == 0x09: out.append("%09")
            elif ch == 0x0A: out.append("%0A")
            elif ch == 0x25: out.append("%25")
            elif ch < 0x20 or ch > 0x7E: out.append("%%%02X" % ch)
            else: out.append(chr(ch))
        return "".join(out)

    lines = []
    for i in range(nt.n):
        ty = tyname[int(nt.type[i])]
        if ty == "doc":
            lines.append("doc\t\t0\t0\t\t")
            continue
        if ty in ("elem", "template"):
            attrs = " ".join(
                f"{esc(k)}={esc(v)}" for k, v in (nt.attrs[i] or {}).items()
            )
            lines.append(
                f"{ty}\t{nt.tag_name[i]}\t{int(t0b[i])}\t{int(t1b[i])}\t{attrs}\t"
            )
        else:
            lines.append(
                f"{ty}\t\t{int(s0b[i])}\t{int(s1b[i])}\t\t{esc(nt.text[i] or '')}"
            )
    lines.append(f"#errors\t{nt.parse_errors}")
    return lines


def _diff_doc(shim: str, data: bytes, verbose: bool) -> list[str]:
    proc = subprocess.run([shim], input=data, capture_output=True, timeout=60)
    if proc.returncode != 0:
        return [f"shim exited {proc.returncode}"]
    gumbo = proc.stdout.decode("utf-8", "replace").rstrip("\n").split("\n")
    ours = _engine_lines(data)
    out = []
    for k, (g, o) in enumerate(zip(gumbo, ours)):
        if g == o:
            continue
        gf, of = g.split("\t"), o.split("\t")
        # implied-element span convention (documented): gumbo -1/-1 vs
        # the engine's zero-length span at the insertion offset
        if (len(gf) == 6 and len(of) == 6 and gf[0] == of[0] == "elem"
                and gf[1] == of[1] and gf[4] == of[4]
                and gf[2] == gf[3] == "-1" and of[2] == of[3]):
            continue
        out.append(f"  line {k}:\n    gumbo : {g}\n    engine: {o}")
    if len(gumbo) != len(ours):
        out.append(f"  node count: gumbo={len(gumbo)} engine={len(ours)}")
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shim", required=True, help="built libgumbo_shim binary")
    ap.add_argument("--corpus", default=None,
                    help="conformance cases file (default: tests/conformance)")
    ap.add_argument("--max", type=int, default=0, help="stop after N docs")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, f"{REPO}/tests")
    from test_conformance import CASES  # noqa: E402

    n = bad = 0
    for ctx, data, _ in CASES:
        if ctx is not None:
            continue  # fragment cases: gumbo_parse_fragment mapping TBD
        raw = data.encode("utf-8", "surrogatepass") if isinstance(data, str) else data
        n += 1
        diffs = _diff_doc(args.shim, raw, args.verbose)
        if diffs:
            bad += 1
            if bad <= 20:
                print(f"DIVERGE [{n}] {raw[:100]!r}")
                print("\n".join(diffs[:8]))
        if args.max and n >= args.max:
            break
    print(f"{n} documents, {bad} divergent")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
