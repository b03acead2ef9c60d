"""Streaming layer (stretch beyond the batch-only reference)."""
