"""Scalar function library (deterministic, oracle-verified)."""
