"""Operator implementations shared by the batch and streaming
compilers (windows, stateful computations, python-path execution)."""
