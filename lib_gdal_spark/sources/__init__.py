"""Sources: deterministic synthetic generators + testdata readers."""
