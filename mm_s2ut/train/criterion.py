"""Placeholder — filled in by the training layer (B5)."""
