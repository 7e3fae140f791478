"""Scalar-function layer: logical-type stringifiers, dotted-path
extraction, canonical JSON encoding (SURVEY.md §2.3)."""
