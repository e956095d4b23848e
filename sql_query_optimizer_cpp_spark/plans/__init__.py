"""Plans: explain/trace/cost (filled in a later milestone)."""
