"""Sources: synthetic docs-table generation, table readers, word lists."""
