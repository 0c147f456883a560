"""C fast-path engine loader + NodeTable assembly.

``cparse(source)`` returns a :class:`NodeTable` for documents inside
the C engine's subset (pure-ASCII, no parse errors, no foreign
content / templates / framesets / fragments — see _cext/chtml.c), or
``None`` when the pure-Python engine must run.  The Python engine in
``html5.py`` remains the reference implementation; the C engine is
required to be column-for-column identical whenever it engages
(tests/test_cengine.py runs that A/B over the conformance corpus).

Build: the extension is compiled on demand with the in-sandbox gcc
(`python -m gumbo_pp_spark.parser.cengine` or first import).  For a
cluster run, build once and ship the ``.so`` with ``--py-files`` (it
lives inside the package directory).

Env:
  GUMBO_PP_CENGINE=0   disable the C engine entirely
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig

import numpy as np

_DIR = os.path.join(os.path.dirname(__file__), "_cext")
_SO = os.path.join(_DIR, "_chtml.so")

#: engagement counters: documents parsed by each engine this process
stats = {"c": 0, "py": 0}

_cparse = None
_NodeTable = None


def _build() -> bool:
    """Compile the extension in-tree (idempotent). Returns success."""
    src = os.path.join(_DIR, "chtml.c")
    hdr = os.path.join(_DIR, "chtml_tables.h")
    if not os.path.exists(src):
        return False
    if not os.path.exists(hdr):
        from . import _cext  # noqa: F401
        from ._cext.gen_tables import main as _gen

        _gen()
    inc = sysconfig.get_paths()["include"]
    # pid-suffixed temp: many Spark python workers may import (and so
    # build) concurrently on a fresh checkout; os.replace is atomic
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = ["gcc", "-O2", "-fPIC", "-shared", "-I", inc, src, "-o", tmp]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
    except Exception:
        return False
    if r.returncode != 0:
        return False
    os.replace(tmp, _SO)
    return True


def _load() -> None:
    global _cparse
    if os.environ.get("GUMBO_PP_CENGINE", "1") == "0":
        return
    if not os.path.exists(_SO) and not _build():
        return
    if _DIR not in sys.path:
        sys.path.insert(0, _DIR)
    try:
        import _chtml  # type: ignore

        _cparse = _chtml.cparse
    except Exception:
        _cparse = None


def available() -> bool:
    return _cparse is not None


def cparse(source):
    """C fast-path parse → NodeTable, or None (use the Python engine).

    Accepts str / bytes / bytearray / memoryview like
    :func:`parser.html5.parse_html`.
    """
    if _cparse is None:
        return None
    res = _cparse(source)
    if res is None:
        return None
    (cnt, b_type, b_ns, b_tid, b_parent, b_iwp, b_sub, b_span,
     tags, texts, attrs, quirks, errors, src) = res
    global _NodeTable
    if _NodeTable is None:
        from ..nodetable import NodeTable as _NT

        _NodeTable = _NT
    spans = np.frombuffer(b_span, dtype=np.int64).reshape(cnt, 6)
    tag_name = np.empty(cnt, dtype=object)
    tag_name[:] = tags
    text = np.empty(cnt, dtype=object)
    text[:] = texts
    attrs_arr = np.empty(cnt, dtype=object)
    attrs_arr[:] = attrs
    nt = _NodeTable(
        source=src,
        type=np.frombuffer(b_type, dtype=np.int8),
        tag_id=np.frombuffer(b_tid, dtype=np.int16),
        tag_name=tag_name,
        parent=np.frombuffer(b_parent, dtype=np.int32),
        index_within_parent=np.frombuffer(b_iwp, dtype=np.int32),
        subtree_end=np.frombuffer(b_sub, dtype=np.int32),
        text=text,
        attrs=attrs_arr,
        src_start=spans[:, 0],
        src_end=spans[:, 1],
        tag_start=spans[:, 2],
        tag_end=spans[:, 3],
        endtag_start=spans[:, 4],
        endtag_end=spans[:, 5],
        parse_errors=len(errors),
        ns=np.frombuffer(b_ns, dtype=np.int8),
        error_records=errors,
        quirks=bool(quirks),
    )
    # NOTE: byte-map state (raw / _prenorm / _byte_map_built) is set
    # by the caller (parse_html), which knows whether the input was
    # raw bytes, identity-mapped, or CR/multibyte-normalized.
    return nt


_load()


if __name__ == "__main__":
    ok = _build()
    print(_SO if ok else "BUILD FAILED")
