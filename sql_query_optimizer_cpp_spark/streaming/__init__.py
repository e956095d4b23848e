"""Streaming (filled in a later milestone)."""
