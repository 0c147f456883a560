from .tags import TAG_IDS, TAG_NAMES, TAG_UNKNOWN  # noqa: F401


def __getattr__(name):
    # lazy to avoid a circular import (html5 → nodetable → tags)
    if name == "parse_html":
        from .html5 import parse_html

        return parse_html
    raise AttributeError(name)
