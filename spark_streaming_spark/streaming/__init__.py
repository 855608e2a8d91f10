"""Structured Streaming layer: typed sources, deterministic replay,
reference-parity pipelines (SURVEY.md §2.9/§2.10, build plan stage 2)."""
