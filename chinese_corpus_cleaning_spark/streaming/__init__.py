"""Structured Streaming variant of the quality-filter pipeline."""
