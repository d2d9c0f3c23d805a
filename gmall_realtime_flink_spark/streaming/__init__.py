"""Structured Streaming layer: sources, keyed-state operators, sinks.

The reference is a DAG of 8 Flink *streaming* jobs; this package is
their Spark Structured Streaming re-expression. Batch and streaming
share the same downstream transformation functions (operators/), so
every streaming job is testable against the batch form on bounded
input (see tests/test_streaming.py parity asserts).
"""
