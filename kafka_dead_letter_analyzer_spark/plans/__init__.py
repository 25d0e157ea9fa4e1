"""Logical-plan assembly: the full analyzer dataflow (SURVEY.md §3.2)."""
