"""Operators: extraction, blocking, pair generation, scoring, clustering."""
