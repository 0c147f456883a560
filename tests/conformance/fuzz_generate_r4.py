"""Round-4 fuzz-wave generator (same provenance as fuzz_generate.py:
run with the py3.7 interpreter whose pip vendors html5lib; goldens are
the public html5lib reference implementation's trees).

Three NEW profiles targeting round-3's known-thin areas (memory notes:
"in-caption mode, remaining fragment corners, deep foreign+table"):

* ``caption_soup`` — captions/table structure chaos: captions opened
  and closed out of order, marquee/object/applet INSIDE captions
  (scope-hiding), nested tables, cell/section end tags from caption
  context, colgroups.  Alphabet avoids dt/dd/pre (the fostered-dt and
  fostered-pre-newline html5lib-1.x artifact families would dominate
  the diffs).
* ``aaa_soup`` — adoption-agency stress: dense formatting tags
  (a/b/i/em/strong/nobr/font/small/s/u/big/tt/strike) interleaved
  with SAFE special blocks (div/p/address/article/section — html5lib
  1.x is missing figcaption/summary/hgroup from specialElements, a
  documented artifact family, so those are excluded) plus stray end
  tags to trigger multi-iteration outer loops and the >3 ejection
  rule.
* ``foreign_deep`` — svg/math nesting: integration points
  (foreignObject/desc/title, annotation-xml encodings, mtext/mi/mo),
  HTML breakout tags inside foreign content, CDATA, camelCase fixups,
  nested svg-in-math-in-svg, tables around and inside foreign roots.

Plus two fresh-seed waves of the round-3 ``soup``/``rep_soup``
profiles (regression net over the whole alphabet).

template/<main>/frameset cases are excluded at generation (html5lib
1.x artifact families); textarea likewise (its tokenizer-only RCDATA
handling is a pinned artifact family, tests/test_oracle_artifacts.py).
Residual diffs are classified per the round-3 discipline: engine bug →
fix + pinned edge test; html5lib artifact → machine-verified emulation
test in tests/test_oracle_artifacts.py; only then is a wave committed
(with artifact cases excluded).

Run:  /root/.pyenv/versions/3.7.16/bin/python tests/conformance/fuzz_generate_r4.py
"""

import io
import os
import random
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from generate import serialize  # noqa: E402

from pip._vendor import html5lib  # noqa: E402

from fuzz_generate_r3 import soup, rep_soup  # noqa: E402  (same alphabets)

CAP_STARTS = (
    "table caption tr td th tbody thead tfoot colgroup col div span b i "
    "a p marquee object applet select option center font li ul button "
    "form label"
).split()
CAP_ENDS = (
    "table caption tr td th tbody thead tfoot colgroup div span b i a p "
    "marquee object applet select center font li ul html body"
).split()
CAP_TEXTS = ["x", " ", "\n", "cell", "a&amp;b", "&copy 2020", "  pad"]

FMT = "a b i em strong nobr font small s u big tt strike code".split()
BLOCKS = "div p address article section blockquote aside center".split()

SVG_TAGS = (
    "svg g circle rect text path foreignObject desc title annotation-xml "
    "math mi mo mn ms mtext malignmark mglyph semantics"
).split()
BREAKOUT = (
    "b big blockquote body br center code dd div dl dt em embed h1 head "
    "hr i img li listing menu meta nobr ol p s small span strong strike "
    "sub sup table td th tr u ul var font"
).split()
FOREIGN_ATTRS = ["", ' encoding="text/html"', ' encoding="application/xhtml+xml"',
                 ' xmlns="x"', " definitionURL=d", ' viewBox="0 0 1 1"',
                 ' xlink:href="h"', ' xml:lang="en"']


def caption_soup(rng, n_tokens):
    parts = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.40:
            parts.append("<%s>" % rng.choice(CAP_STARTS))
        elif r < 0.70:
            parts.append("</%s>" % rng.choice(CAP_ENDS))
        elif r < 0.95:
            parts.append(rng.choice(CAP_TEXTS))
        else:
            parts.append(rng.choice(("<!-- c -->", "< notatag", "</>")))
    return "".join(parts)


def aaa_soup(rng, n_tokens):
    parts = []
    recent = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.30:
            t = rng.choice(FMT)
            parts.append("<%s>" % t)
            recent.append(t)
        elif r < 0.45:
            b = rng.choice(BLOCKS)
            parts.append("<%s>" % b)
            recent.append(b)
        elif r < 0.80 and recent:
            # close something seen (not necessarily innermost) —
            # misnesting is the point
            parts.append("</%s>" % rng.choice(recent[-8:]))
        elif r < 0.93:
            parts.append(rng.choice(("x", "y", " ", "txt", "&amp;")))
        else:
            parts.append("</%s>" % rng.choice(FMT))
    return "".join(parts)


def foreign_deep(rng, n_tokens):
    parts = []
    depth = 0
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.35:
            t = rng.choice(SVG_TAGS)
            parts.append("<%s%s>" % (t, rng.choice(FOREIGN_ATTRS)))
            depth += 1
        elif r < 0.50 and depth:
            parts.append("</%s>" % rng.choice(SVG_TAGS))
            depth -= 1
        elif r < 0.62:
            parts.append("<%s>" % rng.choice(BREAKOUT))
        elif r < 0.72:
            parts.append(rng.choice(("<table>", "<tr>", "<td>", "</table>", "</td>")))
        elif r < 0.90:
            parts.append(rng.choice(("t", " ", "&amp;", "<![CDATA[z]]>", "&notin;")))
        else:
            parts.append(rng.choice(("<!-- k -->", "</html>", "</body>", "</svg>", "</math>")))
    return "".join(parts)


SKIP = ("template", "<main", "frameset", "textarea", "isindex")


def gen(fname, fn, count, lo, hi, seed):
    rng = random.Random(seed)
    out = io.StringIO()
    n = 0
    for _ in range(count):
        src = fn(rng, rng.randrange(lo, hi))
        if any(k in src for k in SKIP):
            continue
        try:
            golden = serialize(html5lib.parse(src, treebuilder="dom"))
        except Exception:
            continue
        out.write("#data\n%s\n#document\n%s\n\n" % (src, golden))
        n += 1
    with io.open(fname, "w", encoding="utf-8", newline="") as f:
        f.write(out.getvalue())
    print(fname, n)


if __name__ == "__main__":
    os.makedirs("/tmp/fuzz4", exist_ok=True)
    gen("/tmp/fuzz4/waveCap.dat", caption_soup, 1500, 6, 60, 0x4CA1)
    gen("/tmp/fuzz4/waveAAA.dat", aaa_soup, 1500, 6, 60, 0x4AA2)
    gen("/tmp/fuzz4/waveFor.dat", foreign_deep, 1500, 6, 60, 0x4F03)
    gen("/tmp/fuzz4/waveS.dat", soup, 1200, 8, 70, 0x4504)
    gen("/tmp/fuzz4/waveR.dat", rep_soup, 800, 10, 80, 0x4505)
