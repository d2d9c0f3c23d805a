"""Operator library: pure DataFrame -> DataFrame transformations.

One function per operator family of SURVEY.md §2. Batch and streaming
pipelines share these; docstrings cite the reference implementation
(`RT/` = gmall-realtime/src/main/java/com/codejiwei/gmall/realtime/).
"""
