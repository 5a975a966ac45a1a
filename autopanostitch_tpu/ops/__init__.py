"""Compute-path primitives: geometry, projections, sampling, SIFT, matching."""
