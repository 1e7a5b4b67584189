"""Structured Streaming layer: continuous encode of arriving token files."""
