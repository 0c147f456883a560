"""Fragment-parsing rules flushed out by the round-4 fragment fuzz
campaign (2×1,500 generated cases per wave, html5lib parseFragment as
oracle; the 2,892 matching cases are committed as
tests/conformance/fragments_r4.dat).  Each test pins one engine rule
the campaign fixed; html5lib-only divergences are pinned separately in
test_oracle_artifacts.py."""

from gumbo_pp_spark.parser.html5 import parse_html
from gumbo_pp_spark.parser.serialize import serialize_fragment


def frag(src, ctx, ns="html"):
    return serialize_fragment(
        parse_html(src, {"fragment_context": ctx, "fragment_namespace": ns})
    )


class TestFragmentResetSubstitution:
    """'Reset the insertion mode appropriately' must substitute the
    CONTEXT element for the first stack node (the synthetic root) —
    without it, a reset inside a tbody/tr/... fragment landed in
    in-body off the root's 'html' tag."""

    def test_tbody_reset_after_nested_table(self):
        # the <table> start is itself ignored (no section in table
        # scope); the </table> is ignored too and RESETS nothing —
        # both tr runs must behave per in-table-body (insert at root,
        # no implied tbody), which requires the context substitution
        # once the inner cell's </tr> pops back out (oracle-verified)
        assert frag("<table><tr><td>x</td></tr></table><tr><td>y", "tbody") == (
            "\n".join(
                [
                    "| <tr>",
                    "|   <td>",
                    '|     "x"',
                    "| <tr>",
                    "|   <td>",
                    '|     "y"',
                ]
            )
        )

    def test_html_context_builds_head_and_body(self):
        # spec reset: html -> before head; real head/body children
        assert frag("x<p>y", "html") == "\n".join(
            [
                "| <head>",
                "| <body>",
                '|   "x"',
                "|   <p>",
                '|     "y"',
            ]
        )

    def test_head_context_uses_in_body(self):
        # gumbo/html5lib-era rule: ctx=head resets to in-body (the
        # modern spec's "in head" applies only to a REAL open head)
        assert frag("<p>x", "head") == "\n".join(["| <p>", '|   "x"'])


class TestFragmentTableBodyGuards:
    """in-table-body caption/col/colgroup/tbody/tfoot/thead/table
    start tags are IGNORED when no tbody/thead/tfoot is in table scope
    (the fragment case) — previously the engine fell through to
    in-table and inserted an implied colgroup/tbody."""

    def test_col_ignored(self):
        assert frag("<col><tr><td>x", "tbody") == "\n".join(
            ["| <tr>", "|   <td>", '|     "x"']
        )

    def test_caption_and_tbody_ignored(self):
        assert frag("<caption><tbody><tr>", "thead") == "| <tr>"

    def test_tr_inserts_directly_no_implied_tbody(self):
        assert frag("<tr disabled>", "tbody") == "\n".join(
            ["| <tr>", '|   disabled=""']
        )


class TestFragmentBodyAlias:
    """body_id aliases the synthetic root in a fragment parse; the
    <body>/</body>/</html>/<frameset> rules must not treat that alias
    as a real body (html5lib ignores all of them in innerHTML mode:
    no body is ever in scope)."""

    def test_end_body_ignored(self):
        # without the guard the parser moved to after-body and the
        # comment re-homed to the document level
        assert frag("<b>x</body><!-- c -->y", "div") == "\n".join(
            ["| <b>", '|   "x"', "|   <!--  c  -->", '|   "y"']
        )

    def test_end_html_ignored(self):
        assert frag("x</html><!-- c -->", "span") == "\n".join(
            ['| "x"', "| <!--  c  -->"]
        )

    def test_body_attrs_not_merged_onto_root(self):
        nt = parse_html("<body class=c>x", {"fragment_context": "div"})
        assert nt.attrs[1] in (None, {})  # synthetic root keeps no attrs
        assert frag("<body class=c>x", "div") == '| "x"'

    def test_frameset_does_not_detach_root(self):
        assert frag("x<frameset><frame>", "div") == '| "x"'


class TestFragmentSelectInTable:
    """A select opened while the insertion mode is a table mode is an
    "in select in table" select even when the fragment has no table
    ELEMENT on the stack — table-structure start tags then pop the
    select and are reprocessed."""

    def test_breakout_in_tbody_fragment(self):
        assert frag("<select><tr><td>x", "tbody") == "\n".join(
            ["| <select>", "| <tr>", "|   <td>", '|     "x"']
        )

    def test_bare_select_fragment_still_ignores(self):
        assert frag("<td>x", "select") == '| "x"'

    def test_document_parse_unchanged(self):
        from gumbo_pp_spark.parser.serialize import serialize_tree

        got = serialize_tree(parse_html("<select><td>x"))
        assert "<td>" not in got  # bare select ignores table tags


class TestFragmentNoQuirks:
    """Fragment parsing uses the context document's mode — no-quirks
    for a fresh context (html5lib never visits its initial phase in
    innerHTML mode), so <table> DOES close an open <p>."""

    def test_table_closes_p(self):
        assert frag("<p>x<table>", "ol") == "\n".join(
            ["| <p>", '|   "x"', "| <table>"]
        )

    def test_document_without_doctype_still_quirks(self):
        from gumbo_pp_spark.parser.serialize import serialize_tree

        got = serialize_tree(parse_html("<p>x<table>"))
        # quirks: table nests inside the open p
        assert got.index("<table>") > got.index("<p>")
        assert "|       <table>" in got


class TestFragmentAfterBodyHtml:
    """after-body </html> is IGNORED in a fragment parse (spec
    fragment case; html5lib never reaches after-after-body in
    innerHTML mode) — a following comment stays inside the root
    instead of re-homing to the document."""

    def test_comment_stays_in_fragment(self):
        assert frag("</html><!-- c -->", "html") == "\n".join(
            ["| <head>", "| <body>", "| <!--  c  -->"]
        )


class TestFragmentTableBodyEndTable:
    """in-table-body </table> gates on an open SECTION in table scope
    (spec: clear back to table-body context, pop the section,
    reprocess) — a tbody/tfoot-context fragment must close its open
    section even with no table element on the stack."""

    def test_section_closed_in_table_fragment(self):
        got = frag('<tfoot a=1></table><aside></tfoot>x', "table")
        assert got == "\n".join(
            ["| <tfoot>", '|   a="1"', "| <aside>", '|   "x"']
        )

    def test_tr_fragment_ignores(self):
        # in-row: no tr in table scope (the context element is not on
        # the stack) -> ignored
        assert frag("</table><td>x", "tr") == "\n".join(
            ["| <td>", '|   "x"']
        )


# ----------------------------------------------------------------------
# Round-6 widening: the FULL tag vocabulary as fragment contexts.
# No html5lib in this sandbox (the round-4 oracle corpus is frozen in
# conformance/fragments_r4.dat), so these goldens are derived from the
# WHATWG spec by hand: every context element reachable by the "reset
# the insertion mode appropriately" rule falls into one of five
# behavior classes for a fixed probe input, pinned per class below.
# ----------------------------------------------------------------------
from gumbo_pp_spark.parser.tags import TAG_NAMES

PROBE = "a<div>b</div><span>c</span>"

# context classes for PROBE (WHATWG reset rule + tokenizer state):
#   rawtext  — tokenizer starts in RAWTEXT/script-data/PLAINTEXT: the
#              whole input is ONE undecoded text node (no elements)
#   rcdata   — RCDATA: one text node, character references decoded
#   empty    — in-column-group / in-frameset ignore every probe token
#   html     — before-head pipeline builds real <head>/<body>
#   select   — in-select: only character tokens survive, merged
#   default  — everything else reaches in-body (directly, via in-cell/
#              in-caption, or via foster-parenting out of the table
#              modes, which for a rootless fragment lands at the root)
RAWTEXT_CTX = {"script", "style", "iframe", "xmp", "noembed", "noframes", "plaintext"}
RCDATA_CTX = {"title", "textarea"}
EMPTY_CTX = {"colgroup", "frameset"}

DEFAULT_GOLDEN = "\n".join(
    ['| "a"', "| <div>", '|   "b"', "| <span>", '|   "c"']
)
HTML_GOLDEN = "\n".join(
    ["| <head>", "| <body>", '|   "a"', "|   <div>", '|     "b"',
     "|   <span>", '|     "c"']
)


class TestFragmentContextVocabulary:
    def test_every_tag_constant_as_context(self):
        for tag in TAG_NAMES:
            out = frag(PROBE, tag)
            if tag in RAWTEXT_CTX or tag in RCDATA_CTX:
                expected = '| "a<div>b</div><span>c</span>"'
            elif tag in EMPTY_CTX:
                expected = ""
            elif tag == "html":
                expected = HTML_GOLDEN
            elif tag == "select":
                expected = '| "abc"'
            else:
                expected = DEFAULT_GOLDEN
            assert out == expected, (tag, out)

    def test_rcdata_contexts_decode_references(self):
        # RCDATA (title/textarea) decodes &amp;; RAWTEXT/script keep it
        for ctx in sorted(RCDATA_CTX):
            assert frag("a&amp;b", ctx) == '| "a&b"', ctx
        for ctx in sorted(RAWTEXT_CTX):
            assert frag("a&amp;b", ctx) == '| "a&amp;b"', ctx

    def test_rawtext_context_no_appropriate_end_tag(self):
        # no start tag was ever emitted, so no end tag is "appropriate":
        # the entire input stays text
        assert frag("</textarea>tail", "textarea") == '| "</textarea>tail"'
        assert frag("</script>alert(1)", "script") == '| "</script>alert(1)"'

    def test_colgroup_context_inserts_cols(self):
        assert frag("<col span=2><col>", "colgroup") == "\n".join(
            ["| <col>", '|   span="2"', "| <col>"]
        )
        # anything-else "acts as </colgroup>", which in the fragment
        # case (current node is the root, not a colgroup) is ignored
        assert frag("<col>x<div>y", "colgroup") == "| <col>"

    def test_frameset_context(self):
        assert frag("<frame src=a><frameset rows=2><frame></frameset>", "frameset") == (
            "\n".join(["| <frame>", '|   src="a"', "| <frameset>",
                       '|   rows="2"', "|   <frame>"])
        )

    def test_select_context_options_and_fragment_input_ignored(self):
        # in-select: option/optgroup insert; <input> with no select in
        # table scope (the fragment case) is IGNORED
        assert frag("<option>a<optgroup><option>b<input disabled>", "select") == (
            "\n".join(["| <option>", '|   "a"', "| <optgroup>",
                       "|   <option>", '|     "b"'])
        )

    def test_template_context_table_pipeline(self):
        # in-template pops/pushes per token class and reprocesses:
        # caption -> in-table; col -> in-column-group; tr -> in-table-
        # body; td -> in-row (WHATWG "in template")
        assert frag("<tr><td>c", "template") == "\n".join(
            ["| <tr>", "|   <td>", '|     "c"']
        )
        assert frag("<td>x</td>", "template") == "\n".join(["| <td>", '|   "x"'])
        assert frag("<col>x", "template") == "| <col>"
        assert frag(
            "<caption><col><colgroup><tbody><tfoot><thead><tr><td>x", "template"
        ) == "\n".join(
            ["| <caption>", "| <colgroup>", "|   <col>", "| <colgroup>",
             "| <tbody>", "| <tfoot>", "| <thead>", "|   <tr>",
             "|     <td>", '|       "x"']
        )


class TestForeignFragmentContexts:
    """svg/math fragment contexts (GumboOptions fragment_namespace):
    dispatch off the ADJUSTED current node = the context element while
    only the root is open, integration points included."""

    def test_svg_context_keeps_svg_elements(self):
        assert frag("<rect/><circle/>", "svg", "svg") == "\n".join(
            ["| <svg rect>", "| <svg circle>"]
        )
        assert frag("<circle r='1'/>text", "svg", "svg") == "\n".join(
            ["| <svg circle>", '|   r="1"', '| "text"']
        )

    def test_svg_breakout_pops_then_html(self):
        # WHATWG 13.2.6.5 "any other start tag", breakout list: pop
        # foreign elements (never the HTML-namespace root), then
        # reprocess per the current insertion mode IN HTML CONTENT —
        # browsers produce an HTML <div> sibling, not <svg div>
        # (round-6 fix: the old root-guard inserted foreign instead)
        assert frag("<g><div>break</div>", "g", "svg") == "\n".join(
            ["| <svg g>", "| <div>", '|   "break"']
        )
        assert frag("<div>x", "g", "svg") == "\n".join(["| <div>", '|   "x"'])

    def test_svg_font_breakout_depends_on_attrs(self):
        # <font> breaks out ONLY with color/face/size attributes
        assert frag(
            "<font color=red>x</font><font q=z>y</font>", "g", "svg"
        ) == "\n".join(
            ["| <font>", '|   color="red"', '|   "x"',
             "| <svg font>", '|   q="z"', '|   "y"']
        )

    def test_svg_html_integration_point_contexts(self):
        # foreignObject/desc/title children parse as HTML; the context
        # tag name must be CASE-ADJUSTED (foreignobject->foreignObject)
        # for the integration-point check to see it (round-6 fix)
        for ctx in ("foreignObject", "foreignobject", "desc", "title"):
            assert frag("<p>html here</p>", ctx, "svg") == "\n".join(
                ["| <p>", '|   "html here"']
            ), ctx

    def test_svg_script_is_not_rawtext(self):
        # tokenizer RAWTEXT switching is an HTML tree-construction
        # rule; svg script/style content stays ordinary character data
        assert frag("<script>var x=1;</script>", "svg", "svg") == "\n".join(
            ["| <svg script>", '|   "var x=1;"']
        )
        assert frag("<style>p{}</style>", "svg", "svg") == "\n".join(
            ["| <svg style>", '|   "p{}"']
        )

    def test_math_text_integration_point_contexts(self):
        # mi/mo/mn/ms/mtext: HTML rules for start tags EXCEPT
        # mglyph/malignmark, which stay MathML
        for ctx in ("mi", "mo", "mn", "ms", "mtext"):
            assert frag("<p>h</p>", ctx, "math") == "\n".join(
                ["| <p>", '|   "h"']
            ), ctx
        assert frag("text<mglyph/>", "mi", "math") == "\n".join(
            ['| "text"', "| <math mglyph>"]
        )
        # ... but in an ordinary HTML context mglyph is just an
        # unknown HTML element
        assert frag("<mglyph/>", "div") == "| <mglyph>"

    def test_mtext_context_svg_subtree(self):
        # <svg> at a MathML text IP goes through HTML rules -> in-body
        # inserts a foreign svg subtree
        assert frag("<svg><circle/></svg>", "mtext", "math") == "\n".join(
            ["| <svg svg>", "|   <svg circle>"]
        )

    def test_annotation_xml_context_without_encoding_breaks_out(self):
        # a fragment context element carries no attributes, so
        # annotation-xml is NOT an HTML integration point here; <p> is
        # a breakout tag -> pop loop stops at the root -> HTML <p>
        assert frag("<p>h</p>", "annotation-xml", "math") == "\n".join(
            ["| <p>", '|   "h"']
        )
        # non-breakout content stays MathML
        assert frag("<mrow>m</mrow>", "annotation-xml", "math") == "\n".join(
            ["| <math mrow>", '|   "m"']
        )

    def test_math_context_keeps_math_elements(self):
        assert frag("<mi>x</mi>", "math", "math") == "\n".join(
            ["| <math mi>", '|   "x"']
        )
