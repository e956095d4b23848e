"""Sources: readers/writers (filled in a later milestone)."""
