"""Generate a deterministic random-tag-soup fuzz corpus and its golden
trees from the public html5lib reference implementation (same
provenance as generate.py; run with the py3.7 interpreter that vendors
html5lib inside pip).

Run:  /root/.pyenv/versions/3.7.16/bin/python tests/conformance/fuzz_generate.py

Writes fuzz.dat (html5lib-tests format) next to this file.  The
generator seeds Python's RNG with a constant, so the corpus is
reproducible; regenerate after widening the alphabets.

Alphabet notes (what the soup deliberately exercises):
* misnested formatting + block tags → adoption agency paths
* table parts in wrong contexts → foster parenting
* select/option breakouts, li/dd/dt implied ends, headings
* svg/math with integration points and breakout tags
* entities (named/numeric/legacy), comments, bogus markup, CDATA
* random attributes incl. duplicates and weird quoting
Excluded (no html5lib-1.x support or engine-documented divergence):
<template> (html5lib 1.x predates template support); <main> (html5lib
1.0.1's 'special' category predates main's addition — the engine follows
the modern spec where main IS special, e.g. as an adoption-agency
furthest block); frameset tags
(html5lib's tokenizer drops INTERNAL whitespace of mixed text chunks in
frameset modes — a chunking artifact; the engine follows the modern
per-character spec rule, covered by the authored frameset cases).
"""

import io
import os
import random
import sys

from generate import serialize  # same serializer conventions

from pip._vendor import html5lib

HERE = os.path.dirname(os.path.abspath(__file__))

START_TAGS = (
    "div p span b i em strong a ul ol li dl dt dd h1 h2 h3 table tr td "
    "th tbody thead tfoot caption colgroup col select option optgroup "
    "button nobr small s u strike big font center address article "
    "section nav aside figure blockquote pre code svg math mi mo "
    "mtext ms circle rect text g foreignObject desc annotation-xml "
    "applet marquee object br hr img input wbr area "
    "head body html form label fieldset legend"
).split()

TEXTS = [
    "x", "hello world", " ", "a&amp;b", "&lt;tag&gt;", "1 &notin; 2",
    "&copy 2020", "T&#65;il", "fish & chips", "multi  space", "\n",
    "tail&#x42;", "&unknown;", "", "word",
]

ATTRS = [
    "", ' class="c1 c2"', ' id="x"', " disabled", ' href="h?a=1&b=2"',
    ' title="a&amp;b"', " a=1 a=2", ' style="x:1"', " data-k=v",
    ' encoding="text/html"', " viewbox='0 0 4 4'", ' q="un>usual"',
]

MISC = [
    "<!-- c -->", "<!bogus>", "<?pi x>", "<![CDATA[cd&ta]]>", "</>",
    "</nomatch>", "< notatag", "</ bogus>",
]


def soup(rng, n_tokens):
    parts = []
    open_stack = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.35:
            t = rng.choice(START_TAGS)
            parts.append("<%s%s>" % (t, rng.choice(ATTRS)))
            open_stack.append(t)
        elif r < 0.55 and open_stack:
            # close something — often NOT the innermost (misnesting)
            t = rng.choice(open_stack[-4:])
            parts.append("</%s>" % t)
        elif r < 0.85:
            parts.append(rng.choice(TEXTS))
        else:
            parts.append(rng.choice(MISC))
    return "".join(parts)


# adoption-agency torture profile: only formatting + special blocks,
# heavy on misnested end tags — this wave flushed out the nobr
# reconstruct ordering, the caption </table> rule, and a foster-target
# bug in the adoption agency's common-ancestor insert
FMT_TAGS = "b i em strong a font nobr small s u big tt code".split()
FMT_BLOCKS = (
    "div p li ul dd dt dl h1 h2 table td tr caption button object "
    "marquee aside article"
).split()


def fmt_soup(rng, n_tokens):
    parts = []
    opened = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.30:
            t = rng.choice(FMT_TAGS)
            parts.append("<%s>" % t)
            opened.append(t)
        elif r < 0.50:
            t = rng.choice(FMT_BLOCKS)
            parts.append("<%s>" % t)
            opened.append(t)
        elif r < 0.80 and opened:
            parts.append("</%s>" % rng.choice(opened[-6:]))
        else:
            parts.append(rng.choice(("x", "y ", "&amp;", "1")))
    return "".join(parts)


# entity/attribute torture profile (wave 5): malformed references,
# '='-prefixed attribute names, duplicate/quote-mangled attributes
ENTS = ["&amp;", "&amp", "&AMP;", "&notin;", "&not;", "&notit;", "&copy",
        "&copy;x", "&#65;", "&#65", "&#x41;", "&#X41", "&#0;",
        "&#x110000;", "&#128;", "&#xD800;", "&nbsp", "&nbsp;", "&ampx",
        "&a", "&;", "&#;", "&#x;", "& x", "&lt", "&LT;", "&GT"]
EATTRS = ['a="&amp;"', 'a="&not;b"', 'a="&notb"', "a=&copy", "a='&#65'",
          'href="?x=1&lang=2"', 'href="?a=1&not=2"', 'a="&curren"',
          "a=&curren;y", 'a="&ampy"', "a = 'q'", "a  =  b", "=x", "a==b",
          "'q'", 'a="x" a=y']


def ent_soup(rng, n_tokens):
    parts = []
    for _ in range(n_tokens):
        r = rng.random()
        if r < 0.5:
            parts.append(rng.choice(ENTS))
        elif r < 0.75:
            parts.append("<p %s>" % rng.choice(EATTRS))
        elif r < 0.9:
            parts.append(rng.choice(("x", " ", "</p>", "<b>", "</b>")))
        else:
            parts.append("<span %s %s>" % (rng.choice(EATTRS), rng.choice(EATTRS)))
    return "".join(parts)


# head/doctype/comment structure profile (wave 6)
HEADY = ["<!DOCTYPE html>", "<!doctype HTML>", "<!DOCTYPE other>",
         "<!-- c -->", "<!--", "<!---->", "<!--x--x-->", "<head>",
         "</head>", "<meta charset='u'>", "<title>t</title>",
         "<style>s</style>", "<base href='b'>", "<body>", "</body>",
         "</html>", "<html lang='e'>", " ", "\n", "x", "<link rel='r'>",
         "<script>j</script>", "<noscript><p>n</p></noscript>",
         "<bgsound>", "<p>b</p>", "<!-- unclosed", "<![CDATA[c]]>", "<?pi>"]


def head_soup(rng, n_tokens):
    return "".join(rng.choice(HEADY) for _ in range(n_tokens))


# rawtext-close / CR-normalization profile (wave 7): found the
# '</'-at-EOF text rule and the rawtext-at-EOF newline skip
RAWTEXTY = ["<script>", "</script>", "</script >", "</script x=1>",
            "</scriptx>", "</SCRIPT>", "<ScRiPt>", "<style>", "</style>",
            "<title>", "</title>", "<textarea>", "</textarea>",
            "</ script>", "x\r\ny", "a\rb", "\r", "\r\n",
            "<pre>\r\nL</pre>", "<p\r\na=1>t</p>", "c</", "d<", "e</s",
            "<xmp>", "</xmp>", "<!--\r\n-->", "<td a\r=\r'v'>", "no"]


def rawtext_soup(rng, n_tokens):
    return "".join(rng.choice(RAWTEXTY) for _ in range(n_tokens))


def main():
    rng = random.Random(20260816)
    out = []
    n = 0
    while n < 250:
        data = soup(rng, rng.randint(4, 40))
        if "\x00" in data or "plaintext" in data:
            continue
        doc = html5lib.parse(data, treebuilder="dom")
        tree = serialize(doc)
        out.append("#data\n%s\n#document\n%s\n" % (data, tree))
        n += 1
    rng2 = random.Random(777)
    for _ in range(400):
        data = fmt_soup(rng2, rng2.randint(5, 30))
        doc = html5lib.parse(data, treebuilder="dom")
        out.append("#data\n%s\n#document\n%s\n" % (data, serialize(doc)))
        n += 1
    rng3 = random.Random(555)
    for _ in range(300):
        data = ent_soup(rng3, rng3.randint(3, 12))
        doc = html5lib.parse(data, treebuilder="dom")
        out.append("#data\n%s\n#document\n%s\n" % (data, serialize(doc)))
        n += 1
    rng4 = random.Random(31415)
    for _ in range(300):
        data = head_soup(rng4, rng4.randint(2, 10))
        doc = html5lib.parse(data, treebuilder="dom")
        out.append("#data\n%s\n#document\n%s\n" % (data, serialize(doc)))
        n += 1
    rng5 = random.Random(2718)
    for _ in range(300):
        data = rawtext_soup(rng5, rng5.randint(2, 9))
        doc = html5lib.parse(data, treebuilder="dom")
        out.append("#data\n%s\n#document\n%s\n" % (data, serialize(doc)))
        n += 1
    # newline='' preserves literal CR bytes in #data sections
    with io.open(os.path.join(HERE, "fuzz.dat"), "w", encoding="utf-8", newline="") as f:
        f.write("\n".join(out))
    sys.stdout.write("wrote %d fuzz goldens\n" % n)


if __name__ == "__main__":
    main()
