"""Composable node matchers as vectorized numpy mask kernels.

Re-expresses the reference's matcher algebra
(``include/daw/gumbo_pp/gumbo_matchers.h``): lazily composed predicates
over nodes with ``and/or/xor/not`` combinators (``match_all`` /
``match_any`` / ``match_one`` / ``match_not``,
``gumbo_matchers.h:29-152``) and seven predicate families — tag, class,
id, attribute, content text, inner text, outer text
(``gumbo_matchers.h:160-1077``; verb sets per SURVEY.md §2.3).

Where the reference evaluates one fused closure per node during
iterator traversal, we evaluate each matcher once per *document* (or
per concatenated batch) as a boolean mask over the preorder node
table — combinators become ``& | ^ ~`` on masks, first-match becomes
``argmax``.  User-defined predicates remain first-class via ``where``
verbs accepting vectorized callables (mirroring the reference's
``where(preds...)`` escape hatches at ``gumbo_matchers.h:160,438,482,
509,644,773,904``).

Reference bugs intentionally NOT reproduced (documented divergences,
SURVEY.md §2.3): ``content_text::ends_with`` variadic testing
starts_with for its first argument (``gumbo_matchers.h:610``) and the
never-instantiated broken container overloads.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .nodetable import DOCUMENT, ELEMENT, NodeTable
from .parser.tags import TAG_NAMES


class Matcher:
    """A node predicate: ``NodeTable → bool mask``.

    Compose with ``&`` (match_all), ``|`` (match_any), ``^``
    (match_one), ``~`` (match_not) — mirroring the reference's
    operator sugar (``gumbo_matchers.h:1081-1127``).
    """

    __slots__ = ("fn", "name")

    def __init__(self, fn: Callable[[NodeTable], np.ndarray], name: str = "matcher"):
        self.fn = fn
        self.name = name

    def __call__(self, nt: NodeTable) -> np.ndarray:
        return self.fn(nt)

    def __and__(self, other: "Matcher") -> "Matcher":
        return Matcher(lambda nt: self.fn(nt) & other.fn(nt), f"({self.name} and {other.name})")

    def __or__(self, other: "Matcher") -> "Matcher":
        return Matcher(lambda nt: self.fn(nt) | other.fn(nt), f"({self.name} or {other.name})")

    def __xor__(self, other: "Matcher") -> "Matcher":
        return Matcher(lambda nt: self.fn(nt) ^ other.fn(nt), f"({self.name} xor {other.name})")

    def __invert__(self) -> "Matcher":
        return Matcher(lambda nt: ~self.fn(nt), f"(not {self.name})")

    def __repr__(self) -> str:
        return f"<Matcher {self.name}>"


def match_all(*ms: Matcher) -> Matcher:
    """AND-fold (gumbo_matchers.h:29-62)."""
    return Matcher(lambda nt: np.logical_and.reduce([m(nt) for m in ms]), "match_all")


def match_any(*ms: Matcher) -> Matcher:
    """OR-fold (gumbo_matchers.h:65-99)."""
    return Matcher(lambda nt: np.logical_or.reduce([m(nt) for m in ms]), "match_any")


def match_one(*ms: Matcher) -> Matcher:
    """XOR-fold: odd number of matches (gumbo_matchers.h:101-134)."""
    return Matcher(lambda nt: np.logical_xor.reduce([m(nt) for m in ms]), "match_one")


def match_not(m: Matcher) -> Matcher:
    """Negation (gumbo_matchers.h:136-152)."""
    return ~m


def find_some(nt: NodeTable, *ms: Matcher, start: int = 0):
    """daw::algorithm::find_some analogue (used test.cpp:96-102): first
    node matching ANY predicate, plus the per-predicate hit bitmap at
    that node.  Returns (node_id or -1, list[bool])."""
    masks = [m(nt) for m in ms]
    any_mask = np.logical_or.reduce(masks)
    i = nt.first_match(any_mask, start)
    if i < 0:
        return -1, [False] * len(ms)
    return i, [bool(mk[i]) for mk in masks]


# ----------------------------------------------------------------------
# string-predicate helpers over object arrays (None-safe)
# ----------------------------------------------------------------------
def _obj_eq(vals: np.ndarray, targets: tuple[str, ...]) -> np.ndarray:
    tset = set(targets)
    return np.fromiter((v in tset if v is not None else False for v in vals), dtype=bool, count=len(vals))


def _obj_pred(vals: np.ndarray, pred: Callable[[str], bool]) -> np.ndarray:
    return np.fromiter((pred(v) if v is not None else False for v in vals), dtype=bool, count=len(vals))


def _contains_any(v: str, subs: tuple[str, ...]) -> bool:
    return any(s in v for s in subs)


def _starts_any(v: str, ps: tuple[str, ...]) -> bool:
    return v.startswith(ps)


def _ends_any(v: str, ss: tuple[str, ...]) -> bool:
    return v.endswith(ss)


# ----------------------------------------------------------------------
# tag matchers (gumbo_matchers.h:904-1077)
# ----------------------------------------------------------------------
class _TagNS:
    """``match::tag`` — element-gated tag predicates.  Note the
    reference quirk preserved here: tag matchers gate on node type
    Element, so a parsed ``<template>`` (node type Template) never
    matches ``tag::TEMPLATE`` (gumbo_matchers.h:917-924)."""

    @staticmethod
    def types(*names: str) -> Matcher:
        low = tuple(n.lower() for n in names)
        return Matcher(
            lambda nt: (nt.type == ELEMENT) & np.isin(nt.tag_name, low),
            f"tag::types{low}",
        )

    @staticmethod
    def where(pred: Callable[[np.ndarray], np.ndarray]) -> Matcher:
        """pred receives the tag-name object array, returns a mask
        (vectorized user predicate — gumbo_matchers.h:904-913)."""
        return Matcher(lambda nt: (nt.type == ELEMENT) & np.asarray(pred(nt.tag_name), dtype=bool), "tag::where")

    def __getattr__(self, name: str) -> Matcher:
        tag_l = name.lower().replace("_", "-")
        if tag_l not in TAG_NAMES:
            raise AttributeError(f"unknown tag constant: {name}")
        return self.types(tag_l)


tag = _TagNS()


# ----------------------------------------------------------------------
# attribute matchers (gumbo_matchers.h:160-431) — existential over the
# node's attribute list
# ----------------------------------------------------------------------
class _AttrValueNS:
    @staticmethod
    def is_(name: str, *values: str) -> Matcher:
        return Matcher(lambda nt: _obj_eq(nt.attr_values(name), values), f"attribute::value::is({name})")

    @staticmethod
    def contains(name: str, *subs: str) -> Matcher:
        return Matcher(
            lambda nt: _obj_pred(nt.attr_values(name), lambda v: _contains_any(v, subs)),
            f"attribute::value::contains({name})",
        )

    @staticmethod
    def starts_with(name: str, *prefixes: str) -> Matcher:
        ps = tuple(prefixes)
        return Matcher(
            lambda nt: _obj_pred(nt.attr_values(name), lambda v: v.startswith(ps)),
            f"attribute::value::starts_with({name})",
        )

    @staticmethod
    def ends_with(name: str, *suffixes: str) -> Matcher:
        ss = tuple(suffixes)
        return Matcher(
            lambda nt: _obj_pred(nt.attr_values(name), lambda v: v.endswith(ss)),
            f"attribute::value::ends_with({name})",
        )

    @staticmethod
    def contains_prefix(name: str, prefix: str) -> Matcher:
        """CSS ``|=``: value == prefix or starts with prefix + '-'
        (gumbo_matchers.h:244-259)."""
        pd = prefix + "-"
        return Matcher(
            lambda nt: _obj_pred(nt.attr_values(name), lambda v: v == prefix or v.startswith(pd)),
            f"attribute::value::contains_prefix({name})",
        )

    @staticmethod
    def is_empty(name: str) -> Matcher:
        return Matcher(lambda nt: _obj_eq(nt.attr_values(name), ("",)), f"attribute::value::is_empty({name})")

    @staticmethod
    def is_null(name: str) -> Matcher:
        """Parity verb for attribute::value::is_null
        (gumbo_matchers.h:418-423, value pointer null).  libgumbo
        materializes "" (never a null pointer) for valueless
        attributes, and so does our parser — on any parsed tree this
        matcher is constant-false, preserved for API parity."""
        return Matcher(lambda nt: np.zeros(nt.n, dtype=bool), f"attribute::value::is_null({name})")

    @staticmethod
    def has_value(name: str) -> Matcher:
        return Matcher(
            lambda nt: _obj_pred(nt.attr_values(name), lambda v: v != ""),
            f"attribute::value::has_value({name})",
        )


class _AttrNameNS:
    @staticmethod
    def is_(*names: str) -> Matcher:
        return _AttrNS.exists(*names)


class _AttrNS:
    value = _AttrValueNS()
    name = _AttrNameNS()

    @staticmethod
    def exists(*names: str) -> Matcher:
        nset = frozenset(n.lower() for n in names)

        def fn(nt: NodeTable) -> np.ndarray:
            return np.fromiter(
                ((not nset.isdisjoint(a)) if a else False for a in nt.attrs),
                dtype=bool,
                count=nt.n,
            )

        return Matcher(fn, f"attribute::exists{tuple(nset)}")

    @staticmethod
    def has() -> Matcher:
        return Matcher(
            lambda nt: np.fromiter((bool(a) for a in nt.attrs), dtype=bool, count=nt.n),
            "attribute::has",
        )

    @staticmethod
    def has_none() -> Matcher:
        return ~_AttrNS.has()

    @staticmethod
    def where(pred: Callable[[str, str], bool]) -> Matcher:
        """∃ attribute for which pred(name, value) holds
        (gumbo_matchers.h:160-172)."""

        def fn(nt: NodeTable) -> np.ndarray:
            return np.fromiter(
                (any(pred(k, v) for k, v in a.items()) if a else False for a in nt.attrs),
                dtype=bool,
                count=nt.n,
            )

        return Matcher(fn, "attribute::where")


attribute = _AttrNS()


# ----------------------------------------------------------------------
# class / id matchers — whole-attribute-value equality, NO CSS token
# splitting (gumbo_matchers.h:466-476: class="hello world" does NOT
# match is("hello"))
# ----------------------------------------------------------------------
class _ClassNS:
    @staticmethod
    def is_(*names: str) -> Matcher:
        return Matcher(lambda nt: _obj_eq(nt.class_values(), names), f"class_type::is{names}")

    @staticmethod
    def where(pred: Callable[[str], bool]) -> Matcher:
        return Matcher(lambda nt: _obj_pred(nt.class_values(), pred), "class_type::where")

    @staticmethod
    def has_token(token: str) -> Matcher:
        """EXTENSION (clearly separated from the reference verb set):
        CSS-style whitespace-token membership."""
        return Matcher(
            lambda nt: _obj_pred(nt.class_values(), lambda v: token in v.split()),
            f"class_type::has_token({token})",
        )


class _IdNS:
    @staticmethod
    def is_(*names: str) -> Matcher:
        return Matcher(lambda nt: _obj_eq(nt.id_values(), names), f"id::is{names}")

    @staticmethod
    def where(pred: Callable[[str], bool]) -> Matcher:
        return Matcher(lambda nt: _obj_pred(nt.id_values(), pred), "id::where")


class_type = _ClassNS()
id_ = _IdNS()


# ----------------------------------------------------------------------
# content / inner / outer text matchers (gumbo_matchers.h:509-898)
# ----------------------------------------------------------------------
def _textcol(nt: NodeTable, kind: str) -> list[str]:
    if kind == "content":
        return nt.content_text_many(range(nt.n))
    getter = nt.inner_text if kind == "inner" else nt.outer_text
    return [getter(i) for i in range(nt.n)]


def _span_mask(nt: NodeTable, kind: str, range_fn, str_fn) -> np.ndarray:
    """Evaluate a text predicate per node WITHOUT materializing node
    text: element rows test a (lo, hi) range of one haystack string via
    bounded str.startswith/endswith/find (C-level, zero-copy); the
    round-1 version built outer/inner text of EVERY node first —
    O(n·doc) per document on real pages.  Non-range rows (text-likes,
    comments) test their own text; the document node uses the slow
    getter (its inner text is child-span based)."""
    hay, lo, hi, is_range = nt.text_spans(kind)
    out = np.zeros(nt.n, dtype=bool)
    text = nt.text
    getter = {"content": nt.content_text, "inner": nt.inner_text, "outer": nt.outer_text}[kind]
    rng = is_range.tolist()
    lo_l = lo.tolist()
    hi_l = hi.tolist()
    for i in range(nt.n):
        if rng[i]:
            out[i] = range_fn(hay, lo_l[i], hi_l[i])
        elif nt.type[i] == DOCUMENT:
            out[i] = str_fn(getter(i))
        else:
            out[i] = str_fn(text[i])
    return out


class _TextNS:
    """Shared verb set over one of the three text projections.  The
    reference's inner/outer verbs take the document string explicitly
    (gumbo_matchers.h:644-898); our NodeTable carries the source."""

    def __init__(self, kind: str):
        self._kind = kind
        self._label = {"content": "content_text", "inner": "inner_text", "outer": "outer_text"}[kind]

    def _mk(self, pred: Callable[[str], bool], verb: str) -> Matcher:
        # materializing fallback — only for user-supplied predicates
        # (where/map), which need the concrete string
        kind = self._kind
        return Matcher(
            lambda nt: np.fromiter((pred(t) for t in _textcol(nt, kind)), dtype=bool, count=nt.n),
            f"{self._label}::{verb}",
        )

    def _mk_span(self, range_fn, str_fn, verb: str) -> Matcher:
        kind = self._kind
        return Matcher(
            lambda nt: _span_mask(nt, kind, range_fn, str_fn),
            f"{self._label}::{verb}",
        )

    def where(self, pred: Callable[[str], bool]) -> Matcher:
        return self._mk(pred, "where")

    def map(self, proj: Callable[[str], object], pred: Callable[[object], bool]) -> Matcher:
        """projection-then-test (gumbo_matchers.h:518-524)."""
        return self._mk(lambda t: pred(proj(t)), "map")

    def contains(self, *texts: str) -> Matcher:
        return self._mk_span(
            lambda h, a, b: any(h.find(t, a, b) != -1 for t in texts),
            lambda s: _contains_any(s, texts),
            "contains",
        )

    def is_(self, *texts: str) -> Matcher:
        return self._mk_span(
            lambda h, a, b: any(b - a == len(t) and h.startswith(t, a, b) for t in texts),
            lambda s: s in texts,
            "is",
        )

    def starts_with(self, *prefixes: str) -> Matcher:
        ps = tuple(prefixes)
        return self._mk_span(
            lambda h, a, b: h.startswith(ps, a, b),
            lambda s: s.startswith(ps),
            "starts_with",
        )

    def ends_with(self, *suffixes: str) -> Matcher:
        ss = tuple(suffixes)
        return self._mk_span(
            lambda h, a, b: h.endswith(ss, a, b),
            lambda s: s.endswith(ss),
            "ends_with",
        )

    @property
    def is_empty(self) -> Matcher:
        return self._mk_span(
            lambda h, a, b: b <= a,
            lambda s: s == "",
            "is_empty",
        )


content_text = _TextNS("content")
inner_text = _TextNS("inner")
outer_text = _TextNS("outer")
