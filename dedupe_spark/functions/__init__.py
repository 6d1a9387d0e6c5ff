"""Column functions: text analysis, content hashing, similarity features."""
