"""IO, timing, logging utilities."""
