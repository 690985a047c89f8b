"""Scalar/column function library (Spark expressions + Python mirrors)."""
