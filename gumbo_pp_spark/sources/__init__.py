from .pages import synth_pages, synth_pages_bench  # noqa: F401
