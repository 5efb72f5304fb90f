"""Relational functions feeding the graph engine (SURVEY §2.3 X1–X6)."""
