"""Scalar function layer: converted-type transforms (SURVEY.md D21)."""
