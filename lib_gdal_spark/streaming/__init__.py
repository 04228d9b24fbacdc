"""Batch checkpoint/resume machinery (the engine has no streaming state —
SURVEY.md §1.4/§2.10: resumability is idempotent batch, not state stores)."""
