"""Fragment-parsing rules flushed out by the round-4 fragment fuzz
campaign (2×1,500 generated cases per wave, html5lib parseFragment as
oracle; the 2,892 matching cases are committed as
tests/conformance/fragments_r4.dat).  Each test pins one engine rule
the campaign fixed; html5lib-only divergences are pinned separately in
test_oracle_artifacts.py."""

from gumbo_pp_spark.parser.html5 import parse_html
from gumbo_pp_spark.parser.serialize import serialize_fragment


def frag(src, ctx):
    return serialize_fragment(parse_html(src, {"fragment_context": ctx}))


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
