"""Utilities: profiling/tracing, misc helpers."""

from stove_tpu.utils.profiling import annotate, trace  # noqa: F401
