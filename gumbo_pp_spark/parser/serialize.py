"""html5lib-tests "tree construction" serialization of a NodeTable.

Produces the public fixture format used by the html5lib-tests corpus
(``#document`` sections: ``| <tag>``, indented children, quoted text,
``<!-- comments -->``), so the parser can be conformance-checked
against externally generated golden trees (tests/conformance).

Convention notes (documented divergences from the html5lib printer):

* adjacent text-like nodes (Text/Whitespace/CData) are merged into one
  quoted run — the engine keeps CDATA sections as distinct nodes
  (GumboNodeType parity) while html5lib merges them into text;
* template contents print under a ``content`` line like html5lib, but
  the engine parents children directly under the template node;
* doctype lines are not emitted (the engine records quirks mode only,
  as the reference exposes no doctype node).
"""

from __future__ import annotations

from ..nodetable import (
    CDATA,
    COMMENT,
    ELEMENT,
    NS_NAMES,
    TEMPLATE,
    TEXT,
    WHITESPACE,
    NodeTable,
)

_TEXTLIKE = (TEXT, CDATA, WHITESPACE)


def serialize_tree(nt: NodeTable) -> str:
    """Serialize to html5lib-tests #document format (without the
    leading '#document' header)."""
    lines: list[str] = []

    def emit(depth: int, s: str) -> None:
        lines.append("| " + "  " * depth + s)

    # explicit-stack traversal (tree depth is bounded only by input
    # length — a recursive walk overflows on 1000+-deep documents)
    stack = [(nt.children_ids(0).tolist(), 0, 0)]  # (kids, i, depth)
    while stack:
        kids, i, depth = stack.pop()
        while i < len(kids):
            c = kids[i]
            t = nt.type[c]
            if t in _TEXTLIKE:
                run = [nt.text[c]]
                while i + 1 < len(kids) and nt.type[kids[i + 1]] in _TEXTLIKE:
                    i += 1
                    run.append(nt.text[kids[i]])
                emit(depth, '"' + "".join(run) + '"')
            elif t == COMMENT:
                emit(depth, f"<!-- {nt.text[c]} -->")
            elif t in (ELEMENT, TEMPLATE):
                ns = int(nt.ns[c]) if nt.ns is not None else 0
                prefix = "" if ns == 0 else NS_NAMES[ns] + " "
                emit(depth, f"<{prefix}{nt.tag_name[c]}>")
                attrs = nt.attrs[c] or {}
                for k in sorted(attrs):
                    emit(depth + 1, f'{k}="{attrs[k]}"')
                stack.append((kids, i + 1, depth))  # resume after child
                if t == TEMPLATE:
                    emit(depth + 1, "content")
                    stack.append((nt.children_ids(c).tolist(), 0, depth + 2))
                else:
                    stack.append((nt.children_ids(c).tolist(), 0, depth + 1))
                break
            i += 1

    return "\n".join(lines)


def serialize_fragment(nt: NodeTable) -> str:
    """Serialize a FRAGMENT parse (``parse_html(src,
    {"fragment_context": ...})``) to html5lib-tests
    ``#document-fragment`` form: the children of the synthetic root
    element at depth 0, the root itself (and any attributes a stray
    ``<html>`` token merged onto it — html5lib's hidden root absorbs
    those identically) omitted."""
    lines = serialize_tree(nt).split("\n")
    # root line is '| <html>'; its children are indented one level.
    # Any depth-0 line besides the root (a document-level comment)
    # passes through un-dedented.
    out: list[str] = []
    root_attr = True
    for line in lines[1:]:
        if not line.startswith("| "):
            out.append(line)  # text-node continuation line
            continue
        if not line.startswith("|   "):
            out.append(line)  # document-level sibling of the root
            root_attr = False
            continue
        body = line[4:]
        if root_attr and not body.startswith(("<", '"')) and '="' in body:
            continue  # attribute of the synthetic root
        root_attr = False
        out.append("| " + body)
    return "\n".join(out)
