"""Reusable Column-expression libraries: geospatial, vector math, text.

Everything here returns pyspark Column expressions (JVM-side,
whole-stage-codegen-friendly) — no Python UDFs. These are the
building blocks the graded operator queries compose.
"""
