"""Scalar/aggregate function helpers and the H-category function queries."""
