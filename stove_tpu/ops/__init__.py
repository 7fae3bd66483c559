"""Compute ops: Gaussian algebra, glimpse extraction, matching, kernels."""

from stove_tpu.ops import gaussians, glimpse  # noqa: F401
