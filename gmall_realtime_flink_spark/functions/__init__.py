"""Scalar function library (SURVEY §2.10) + cross-engine parity helpers."""
