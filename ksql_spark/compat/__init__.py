"""Compatibility layer for the reference's SQL idiosyncrasies (SURVEY §4.3):
the AlaSQL `->` nested-access operator and JS-truthiness NOT."""

from ksql_spark.compat.rewriter import Rewriter, rewrite  # noqa: F401
