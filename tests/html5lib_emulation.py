"""Test-only emulation of html5lib 1.x's LEGACY adoption-agency
algorithm (html5parser.py ``InBodyPhase.endTagFormatting``), expressed
against the engine's tree-builder state.  Used by
``tests/test_oracle_artifacts.py`` to machine-verify that every
residual AAA fuzz divergence is EXACTLY html5lib's legacy rule: the
engine re-parsed with this method patched in must reproduce html5lib's
tree byte-for-byte.

The legacy algorithm differs from the modern WHATWG one (which the
engine and libgumbo-era spec implement) in:

* the inner node-lifting loop is CAPPED at 3 iterations
  (``while innerLoopCounter < 3``) and may exit without reaching the
  formatting element — the modern loop is unbounded with a >3
  active-formatting-entry ejection rule instead;
* the stack walk uses a decremented INDEX that goes stale when a
  non-AFE node is removed from the stack (html5lib decrements
  ``index`` but removes by value);
* a missing/out-of-scope formatting entry IGNORES the token
  (``parseError; return``) — the modern rule falls through to "any
  other end tag".
"""

from gumbo_pp_spark.parser.html5 import ELEMENT, NS_HTML, _TreeBuilder


def legacy_adoption_agency(self, name, t0, t1):
    """html5lib-1.x endTagFormatting, in engine terms.  Same contract
    as ``_TreeBuilder._adoption_agency`` (True = token consumed)."""
    stack = self.stack
    afe = self.afe
    outer = 0
    while outer < 8:
        outer += 1
        # elementInActiveFormattingElements: last same-name entry
        # after the last marker
        fe_idx = None
        for k in range(len(afe) - 1, -1, -1):
            e = afe[k]
            if e is None:
                break
            if e[0] == name:
                fe_idx = k
                break
        if fe_idx is None:
            # legacy: falls through to the (legacy) any-other-end-tag
            # walk — html5parser.py:1428-1435 calls endTagOther here;
            # the modern spec IGNORES an out-of-scope subject instead
            self._end_any_other(name, t0, t1)
            return True
        entry = afe[fe_idx]
        fe = entry[4]
        if fe in stack and not self._node_in_scope(fe):
            self._end_any_other(name, t0, t1)
            return True
        if fe not in stack:
            self._err("adoption-agency-1.2", t0)
            del afe[fe_idx]
            return True
        if stack[-1] != fe:
            self._err("adoption-agency-1.3", t0)
        si = stack.index(fe)
        fb = None
        for j in range(si, len(stack)):
            if self._is_special(stack[j]):
                fb = stack[j]
                break
        if fb is None:
            while True:
                nid = stack.pop()
                if nid == fe:
                    break
            afe.remove(entry)
            return True
        ca = stack[si - 1] if si > 0 else 0
        bookmark = fe_idx
        last_node = node = fb
        index = stack.index(fb)
        inner = 0
        while inner < 3:
            inner += 1
            index -= 1
            node = stack[index]
            nai = None
            for k in range(len(afe) - 1, -1, -1):
                e2 = afe[k]
                if e2 is not None and e2[4] == node:
                    nai = k
                    break
            if nai is None:
                stack.remove(node)  # html5lib: remove by value,
                continue            # index NOT re-synced (legacy)
            if node == fe:
                break
            if last_node == fb:
                bookmark = nai + 1
            e2 = afe[nai]
            clone = self._new_node(
                ELEMENT, e2[0], dict(e2[1]) if e2[1] else {}, "",
                e2[2], self.n, e2[2], e2[3], self.n, self.n,
            )
            afe[nai] = [e2[0], e2[1], e2[2], e2[3], clone]
            stack[stack.index(node)] = clone
            node = clone
            self._detach(last_node)
            self._attach(last_node, node)
            last_node = node
        self._detach(last_node)
        if self.ntag[ca] in ("table", "tbody", "tfoot", "thead", "tr"):
            parent, before = self._foster_spot()
            self._attach(last_node, parent, before)
        else:
            self._attach(last_node, ca)
        clone2 = self._new_node(
            ELEMENT, entry[0], dict(entry[1]) if entry[1] else {}, "",
            entry[2], self.n, entry[2], entry[3], self.n, self.n,
        )
        kids = self.nchildren[fb]
        self.nchildren[clone2] = kids
        for c in kids:
            self.nparent[c] = clone2
        self.nchildren[fb] = []
        self._attach(clone2, fb)
        afe.remove(entry)
        afe.insert(min(bookmark, len(afe)), [entry[0], entry[1], entry[2], entry[3], clone2])
        stack.remove(fe)
        stack.insert(stack.index(fb) + 1, clone2)
        self.preorder_ok = False
    return True


class patched_legacy_aaa:
    """Context manager: parse with html5lib's legacy AAA."""

    def __enter__(self):
        import gumbo_pp_spark.parser.html5 as _H

        self._orig = _TreeBuilder._adoption_agency
        _TreeBuilder._adoption_agency = legacy_adoption_agency
        # the C fast path implements the UNPATCHED semantics — force
        # the pure-Python engine while the patch is live (round 5)
        self._c = _H._cparse_fast
        _H._cparse_fast = None
        return self

    def __exit__(self, *exc):
        import gumbo_pp_spark.parser.html5 as _H

        _TreeBuilder._adoption_agency = self._orig
        _H._cparse_fast = self._c
        return False


# ----------------------------------------------------------------------
# html5lib-1.x "any other end tag" walk (InBodyPhase.endTagOther)
# ----------------------------------------------------------------------
# Two legacy traits vs the modern spec walk the engine implements
# (verified against the vendored pip/_vendor/html5lib source):
#   * the name match is NAMESPACE-BLIND (``node.name == token name``
#     pops an SVG/MathML element through HTML, and vice versa);
#   * its ``specialElements`` set contains ONE foreign entry —
#     (svg, foreignObject) — so MathML mi/mo/mn/ms/mtext/
#     annotation-xml and SVG desc/title do NOT abort the walk
#     (constants.py:342-422), and the HTML entries predate
#     figcaption/summary/hgroup (the SpecialsGap family).

from gumbo_pp_spark.parser.html5 import (  # noqa: E402
    _SPECIAL_LI_STOP,
    NS_MATHML,
    NS_SVG,
)

_HTML5LIB_HTML_SPECIALS = (
    (_SPECIAL_LI_STOP | {"address", "div", "p"})
    - {"figcaption", "summary", "hgroup"}
)


def _html5lib_is_special(self, nid):
    ns = self.nns[nid]
    tag = self.ntag[nid]
    if ns == NS_HTML:
        return tag in _HTML5LIB_HTML_SPECIALS
    return ns == NS_SVG and tag == "foreignObject"


def legacy_end_any_other(self, name, t0, t1):
    stk = self.stack
    for k in range(len(stk) - 1, -1, -1):
        nid = stk[k]
        if self.ntag[nid] == name:  # namespace-blind (legacy)
            # generateImpliedEndTags(exclude=name) + pop through node
            while stk[-1] != nid:
                self._close_implied(stk.pop(), t0)
            nid2 = stk.pop()
            base = 6 * nid2
            self.nspan[base + 4], self.nspan[base + 5] = t0, t1
            self.nspan[base + 1] = t1
            if self.ntag[nid2] == "p":
                self.open_p -= 1
            return
        if _html5lib_is_special(self, nid):
            self._err("unexpected-end-tag", t0)
            return
    self._err("unexpected-end-tag", t0)


class patched_legacy_end_any_other:
    """Context manager: parse with html5lib's legacy any-other-end-tag."""

    def __enter__(self):
        import gumbo_pp_spark.parser.html5 as _H

        self._orig = _TreeBuilder._end_any_other
        _TreeBuilder._end_any_other = legacy_end_any_other
        # the C fast path implements the UNPATCHED semantics — force
        # the pure-Python engine while the patch is live (round 5)
        self._c = _H._cparse_fast
        _H._cparse_fast = None
        return self

    def __exit__(self, *exc):
        import gumbo_pp_spark.parser.html5 as _H

        _TreeBuilder._end_any_other = self._orig
        _H._cparse_fast = self._c
        return False


# ----------------------------------------------------------------------
# html5lib-1.x unconditional "in table text" pending
# ----------------------------------------------------------------------
# html5lib's InTablePhase.processCharacters/processSpaceCharacters
# switch to InTableTextPhase UNCONDITIONALLY (html5parser.py:1719-1729)
# — the spec (and libgumbo's handle_in_table) pend only while the
# CURRENT node is table context, and otherwise process each character
# token per in-body with foster parenting enabled, which RECONSTRUCTS
# active formatting even for pure whitespace.  Under html5lib's rule a
# whitespace-only batch flushed into a fostered element is inserted by
# InTableTextPhase.flushCharacters via plain ``tree.insertText`` — no
# reconstruction.  The engine's ``_flush_tt`` already implements
# flushCharacters' whole-batch all-space test, so the legacy behavior
# is EXACTLY "pend every run":


def legacy_chars_in_table(self, raw, start, end):
    self.pending_tt.append((raw, start))


class patched_unconditional_tt:
    """Context manager: parse with html5lib's unconditional
    in-table-text pending."""

    def __enter__(self):
        import gumbo_pp_spark.parser.html5 as _H

        self._orig = _TreeBuilder._chars_in_table
        _TreeBuilder._chars_in_table = legacy_chars_in_table
        # the C fast path implements the UNPATCHED semantics — force
        # the pure-Python engine while the patch is live (round 5)
        self._c = _H._cparse_fast
        _H._cparse_fast = None
        return self

    def __exit__(self, *exc):
        import gumbo_pp_spark.parser.html5 as _H

        _TreeBuilder._chars_in_table = self._orig
        _H._cparse_fast = self._c
        return False


# ----------------------------------------------------------------------
# Family 15 (round 6): colgroup-context fragment characters.
#
# Spec ("in column group", anything-else with a non-colgroup current
# node — the FRAGMENT case): per CHARACTER token, whitespace is
# inserted and non-whitespace ignored, so "hello world" contributes
# the interior space.  html5lib 1.x instead processes tokenizer
# CHUNKS: its mainLoop splits only the LEADING whitespace off a
# Characters token (the remainder is dropped whole), and chunk
# boundaries fall at every "&" — a numeric reference or the
# longest-known named reference is consumed as its own token, a
# failed reference emits a lone "&" token, and the text AFTER it
# starts a new chunk whose leading whitespace survives.  Verified
# against html5lib 1.x probes:
#   "a b c"          -> (nothing)        (interior ws dropped)
#   " a b "          -> " "              (leading ws only)
#   "a&copy 2020 b"  -> " "              (&copy splits; " 2020 b" leads ws)
#   "fish & chips"   -> " "              (bare & splits; " chips" leads ws)


def _h5_amp_chunks(s):
    """html5lib tokenizer chunking of a character run: yields
    ('ent', ref) / ('text', seg) pieces."""
    import html.entities as _HE
    import re as _re

    names = sorted(_HE.html5.keys(), key=len, reverse=True)
    out = []
    i = last = 0
    n = len(s)
    while True:
        j = s.find("&", i)
        if j < 0:
            break
        m = _re.match(r"&#[xX][0-9a-fA-F]+;?|&#[0-9]+;?", s[j:])
        if m:
            if j > last:
                out.append(("text", s[last:j]))
            out.append(("ent", m.group()))
            i = last = j + len(m.group())
            continue
        body = s[j + 1 : j + 33]
        hit = next((nm for nm in names if body.startswith(nm)), None)
        if j > last:
            out.append(("text", s[last:j]))
        if hit:
            out.append(("ent", "&" + hit))
            i = last = j + 1 + len(hit)
        else:
            out.append(("ent", "&"))
            i = last = j + 1
    if last < n:
        out.append(("text", s[last:]))
    return out


def legacy_colgroup_fragment_chars(self, stripped, pos):
    from gumbo_pp_spark.parser.html5 import _WS_SET

    ws_chars = "".join(_WS_SET)
    off = 0
    first = True
    for kind, seg in _h5_amp_chunks(stripped):
        if kind == "text":
            if first:
                first = False  # run-leading ws consumed upstream
            else:
                k = len(seg) - len(seg.lstrip(ws_chars))
                if k:
                    self._insert_text(
                        seg[:k], pos + off, pos + off + k, reconstruct=False
                    )
        else:
            first = False
        off += len(seg)
    self._err("unexpected-character", pos)


class patched_legacy_colgroup_fragment:
    """Context manager: parse colgroup-context fragments with
    html5lib's chunk-leading-whitespace rule."""

    def __enter__(self):
        import gumbo_pp_spark.parser.html5 as _H

        self._orig = _TreeBuilder._colgroup_fragment_chars
        _TreeBuilder._colgroup_fragment_chars = legacy_colgroup_fragment_chars
        self._c = _H._cparse_fast
        _H._cparse_fast = None
        return self

    def __exit__(self, *exc):
        import gumbo_pp_spark.parser.html5 as _H

        _TreeBuilder._colgroup_fragment_chars = self._orig
        _H._cparse_fast = self._c
        return False
