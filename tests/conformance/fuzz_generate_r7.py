# -*- coding: utf-8 -*-
"""Round-7 fuzz-wave generator (py3.7): non-ASCII-rich alphabet: non-ASCII-rich alphabet over names, attrs,
doctype soup, foreign content, entities.  Run with the py3.7
interpreter whose pip vendors html5lib (same provenance as
generate.py); emits #data/#document blocks in the corpus convention.

Campaign record (2026-08-18): two waves, seeds 77 (3,000 cases) and
1234 (4,000 cases) — ZERO divergences after the round-7 ASCII-only
name-lowering fix (the pinned goldens for that fix live in
nonascii_names_r7.goldens).  The wave exists because the earlier fuzz
alphabets were ASCII-centric and hid the bug."""
import io, os, random, sys
sys.path.insert(0, "/root/repo/tests/conformance")
from generate import serialize  # same conventions as the corpus
from pip._vendor import html5lib

random.seed(int(sys.argv[1]) if len(sys.argv) > 1 else 77)
N = int(sys.argv[2]) if len(sys.argv) > 2 else 3000

ascii_n = "abcdefgDIV"
uni = u"\xe9\xc9ГЖ中\U0001d54fıİ\xdfΣK"
ws = u" \t\n"
def name():
    return random.choice("abcdpq") + u"".join(
        random.choice(ascii_n + uni) for _ in range(random.randrange(0, 4)))
def attr():
    k = random.choice(["class", "id", name(), name()])
    v = random.choice([u"1", u"v \xe9", u"中", u"&amp;x", u""])
    q = random.choice([u'"', u"'", u""])
    if v == u"" and random.random() < 0.5: return k
    if q == u"" and (u" " in v): q = u'"'
    return u"%s=%s%s%s" % (k, q, v, q)
def frag():
    k = random.randrange(10)
    nm = name()
    if k == 0: return u"<%s %s>" % (nm, attr())
    if k == 1: return u"</%s>" % nm
    if k == 2: return u"t\xe9xt 中 "
    if k == 3: return u"<table><t%s>f<td>c</td></table>" % random.choice(uni)
    if k == 4: return u"<svg><%s %s/>y</svg>" % (name(), attr())
    if k == 5: return u"<b><i>%s</b>z</i>" % name()
    if k == 6: return u"<!DOCTYPE %s>" % (u"htm" + random.choice(uni))
    if k == 7: return u"<math><annotation-xml encoding=TEXT/HTML><p>h</p></annotation-xml></math>"
    if k == 8: return u"&%s;" % random.choice([u"amp", u"Tab", u"#233", u"#x130", u"bogus"])
    return u"<%s>%s</%s>" % (nm, name(), nm)

out = io.open(sys.argv[3] if len(sys.argv) > 3 else "/tmp/wave_r7.dat", "w", encoding="utf-8")
for t in range(N):
    doc = u"".join(frag() for _ in range(random.randrange(1, 6)))
    try:
        tree = html5lib.parse(doc, treebuilder="dom")
        ser = serialize(tree)
    except Exception:
        continue
    out.write(u"#data\n")
    for ln in doc.split(u"\n"):
        out.write(ln + u"\n")
    out.write(u"#document\n")
    out.write(ser)
    out.write(u"\n")
out.close()
print("done")
