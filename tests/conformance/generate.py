"""Generate golden trees for cases.txt from the PUBLIC html5lib
reference implementation (MIT-licensed; the copy vendored inside pip
for the py3.7 toolchain on this machine — no network needed).

Run with:  /root/.pyenv/versions/3.7.16/bin/python tests/conformance/generate.py

Writes goldens.dat in html5lib-tests style (#data / #document), using
the SAME serialization conventions as gumbo_pp_spark.parser.serialize:
adjacent text nodes merged, 'svg '/'math ' namespace prefixes, template
'content' line, doctype lines omitted.  <template> cases are NOT in the
corpus: html5lib 1.x predates template support (it parents templates in
<body>); template semantics are pinned by the repo's own pytest goldens.  The test harness
(tests/test_conformance.py) re-parses #data with the engine and
compares serializations byte-for-byte.
"""

import io
import os
import sys

from pip._vendor import html5lib  # noqa: E402  (py3.7 pip vendors it)

HERE = os.path.dirname(os.path.abspath(__file__))

NS_PREFIX = {
    "http://www.w3.org/2000/svg": "svg ",
    "http://www.w3.org/1998/Math/MathML": "math ",
}


def serialize(doc):
    lines = []

    def emit(depth, s):
        lines.append("| " + "  " * depth + s)

    def walk(node, depth):
        kids = list(node.childNodes)
        i = 0
        while i < len(kids):
            c = kids[i]
            if c.nodeType == c.TEXT_NODE:
                run = [c.data]
                while i + 1 < len(kids) and kids[i + 1].nodeType == c.TEXT_NODE:
                    i += 1
                    run.append(kids[i].data)
                emit(depth, '"' + "".join(run) + '"')
            elif c.nodeType == c.COMMENT_NODE:
                emit(depth, "<!-- %s -->" % c.data)
            elif c.nodeType == c.DOCUMENT_TYPE_NODE:
                pass  # engine exposes quirks mode only, no doctype node
            elif c.nodeType == c.ELEMENT_NODE:
                prefix = NS_PREFIX.get(c.namespaceURI, "")
                emit(depth, "<%s%s>" % (prefix, c.tagName))
                attrs = sorted(
                    (c.attributes.item(k).name, c.attributes.item(k).value)
                    for k in range(c.attributes.length)
                )
                for name, value in attrs:
                    emit(depth + 1, '%s="%s"' % (name, value))
                if c.tagName == "template" and not prefix:
                    emit(depth + 1, "content")
                    walk(c, depth + 2)
                else:
                    walk(c, depth + 1)
            i += 1

    walk(doc, 0)
    return "\n".join(lines)


def load_cases(path):
    cases = []
    cur = None
    with io.open(path, encoding="utf-8") as f:
        for line in f:
            if line.rstrip("\n") == "#data":
                if cur is not None:
                    cases.append("\n".join(cur))
                cur = []
            elif line.startswith("#") and cur is None:
                continue  # leading comments
            elif cur is not None:
                cur.append(line.rstrip("\n"))
    if cur is not None:
        cases.append("\n".join(cur))
    return cases


def main():
    cases = load_cases(os.path.join(HERE, "cases.txt"))
    out = []
    for data in cases:
        doc = html5lib.parse(data, treebuilder="dom")
        out.append("#data\n%s\n#document\n%s\n" % (data, serialize(doc)))
    with io.open(os.path.join(HERE, "goldens.dat"), "w", encoding="utf-8") as f:
        f.write("\n".join(out))
    sys.stdout.write("wrote %d goldens\n" % len(cases))


if __name__ == "__main__":
    main()
