"""libgumbo differential harness (tools/libgumbo_diff.py) — the
engine-side serializer is always tested; the actual differential run
needs libgumbo, absent from this sandbox (no network, no package
install), so it is skipped here and documented for day-one use on any
machine that has it:

    gcc -O2 tools/libgumbo_shim.c -o /tmp/libgumbo_shim -lgumbo
    LIBGUMBO_SHIM=/tmp/libgumbo_shim python -m pytest tests/test_libgumbo_diff.py
    # or directly:
    python tools/libgumbo_diff.py --shim /tmp/libgumbo_shim
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_engine_serializer_shape():
    """_engine_lines emits the shim's line protocol from parse_html."""
    from libgumbo_diff import _engine_lines

    lines = _engine_lines(b'<div id=a class="b c">x<!-- m --> </div>')
    assert lines[0] == "doc\t\t0\t0\t\t"
    assert lines[-1].startswith("#errors\t")
    kinds = [ln.split("\t")[0] for ln in lines[1:-1]]
    assert kinds[:3] == ["elem", "elem", "elem"]  # html, head, body
    assert "text" in kinds and "comment" in kinds and "ws" in kinds
    div = next(ln for ln in lines if ln.startswith("elem\tdiv"))
    f = div.split("\t")
    assert f[2] == "0" and f[3] == str(len('<div id=a class="b c">'))
    assert f[4] == "id=a class=b c"
    # byte offsets on a non-ASCII doc index the RAW bytes
    lines2 = _engine_lines("<p>é中</p>".encode())
    text = next(ln for ln in lines2 if ln.startswith("text\t"))
    f2 = text.split("\t")
    assert f2[2] == "3" and f2[3] == str(len("<p>é中".encode()))
    assert f2[5] == "%C3%A9%E4%B8%AD"


def test_escaping_is_line_safe():
    from libgumbo_diff import _engine_lines

    lines = _engine_lines(b"<p>a\tb%c</p><pre>\nx</pre>")
    assert all("\t" not in ln.split("\t", 5)[5] for ln in lines
               if ln.startswith("text"))
    joined = "\n".join(lines)
    assert "%09" in joined and "%25" in joined


@pytest.mark.skipif(
    not os.environ.get("LIBGUMBO_SHIM"),
    reason="libgumbo not available in this sandbox; set LIBGUMBO_SHIM to a "
           "built tools/libgumbo_shim.c binary to run the real differential",
)
def test_libgumbo_differential_corpus():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "libgumbo_diff.py"),
         "--shim", os.environ["LIBGUMBO_SHIM"], "--max", "2000"],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout[-4000:]
