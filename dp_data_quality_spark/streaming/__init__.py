"""Structured Streaming surface for the quality-filter stack."""
