"""Scalar column-expression library (SURVEY.md §2.11).

Everything here is pure ``pyspark.sql.functions`` composition — JVM-side,
whole-stage-codegen'd, no Python UDFs in the hot path.
"""
