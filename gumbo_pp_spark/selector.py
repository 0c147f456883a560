"""Declarative selector programs — the engine's serializable query IR
(SURVEY.md §3 E2: "selector program (declarative list of verb/arg
steps) → compiled to vectorized mask kernels").

A program is plain JSON-able data, so spark-submit jobs can ship
queries as config instead of code, mirroring how every gumbo_pp
matcher expression transliterates 1:1:

    C++:  match::tag::DIV and match::id::is("important_table")
    IR:   ["and", ["tag", "div"], ["id_is", "important_table"]]

``compile_selector`` turns the IR into a :class:`~.matchers.Matcher`
(mask kernel).  Verbs cover the reference verb set (SURVEY.md §2.3);
user escape hatches (`where`/`map`) are code-level only by design —
they take callables, which don't serialize.
"""

from __future__ import annotations

from . import matchers as m

_COMBINATORS = {"and": m.match_all, "or": m.match_any, "xor": m.match_one}


def compile_selector(spec) -> m.Matcher:
    """Compile a JSON-able selector spec into a Matcher.

    Grammar (lists; first element is the verb):
      ["and"|"or"|"xor", spec, spec, ...]      combinators
      ["not", spec]
      ["tag", name, ...]                       tag::types
      ["id_is", value, ...]                    id::is (whole-value)
      ["class_is", value, ...]                 class_type::is (whole-value)
      ["class_token", token]                   extension: CSS token match
      ["attr_exists", name, ...]
      ["attr_has"] / ["attr_has_none"]
      ["attr_is"|"attr_contains"|"attr_starts_with"|"attr_ends_with",
        name, value, ...]
      ["attr_prefix", name, prefix]            CSS |= semantics
      ["attr_is_empty"|"attr_has_value"|"attr_is_null", name]
      ["content_contains"|"content_is"|"content_starts_with"|
        "content_ends_with", text, ...] / ["content_is_empty"]
      ["inner_..."], ["outer_..."]             same four + is_empty
      ["css", selector_string]                 CSS subset (css.py)
    """
    if not isinstance(spec, (list, tuple)) or not spec:
        raise ValueError(f"invalid selector spec: {spec!r}")
    verb, *args = spec
    if verb == "css":
        # CSS selector string (css.py) — selector strings ride the
        # same serializable IR as the verb forms
        from .css import css as _css

        return _css(args[0])
    if verb in _COMBINATORS:
        return _COMBINATORS[verb](*[compile_selector(a) for a in args])
    if verb == "not":
        (inner,) = args
        return ~compile_selector(inner)
    if verb == "tag":
        return m.tag.types(*args)
    if verb == "id_is":
        return m.id_.is_(*args)
    if verb == "class_is":
        return m.class_type.is_(*args)
    if verb == "class_token":
        return m.class_type.has_token(args[0])
    if verb == "attr_exists":
        return m.attribute.exists(*args)
    if verb == "attr_has":
        return m.attribute.has()
    if verb == "attr_has_none":
        return m.attribute.has_none()
    if verb == "attr_is":
        return m.attribute.value.is_(args[0], *args[1:])
    if verb == "attr_contains":
        return m.attribute.value.contains(args[0], *args[1:])
    if verb == "attr_starts_with":
        return m.attribute.value.starts_with(args[0], *args[1:])
    if verb == "attr_ends_with":
        return m.attribute.value.ends_with(args[0], *args[1:])
    if verb == "attr_prefix":
        return m.attribute.value.contains_prefix(args[0], args[1])
    if verb == "attr_is_empty":
        return m.attribute.value.is_empty(args[0])
    if verb == "attr_has_value":
        return m.attribute.value.has_value(args[0])
    if verb == "attr_is_null":
        return m.attribute.value.is_null(args[0])
    for family, ns in (("content", m.content_text), ("inner", m.inner_text), ("outer", m.outer_text)):
        if verb == f"{family}_contains":
            return ns.contains(*args)
        if verb == f"{family}_is":
            return ns.is_(*args)
        if verb == f"{family}_starts_with":
            return ns.starts_with(*args)
        if verb == f"{family}_ends_with":
            return ns.ends_with(*args)
        if verb == f"{family}_is_empty":
            return ns.is_empty
    raise ValueError(f"unknown selector verb: {verb!r}")
