"""Reusable scalar-function library (SURVEY §2.8 F-series)."""
