"""Structured Streaming side of the engine."""
