"""Dataflow operators (SURVEY.md §2): reference-parity core + scale extensions."""
