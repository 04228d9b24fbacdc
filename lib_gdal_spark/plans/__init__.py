"""Logical-plan helpers: OGR SQL dialect semantics as DataFrame rewrites."""
