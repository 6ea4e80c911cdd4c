"""Placeholder — populated this round."""
