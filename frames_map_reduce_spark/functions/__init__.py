"""Scalar/array function helpers — all native Column expressions."""

from frames_map_reduce_spark.functions import text, vectors  # noqa: F401
