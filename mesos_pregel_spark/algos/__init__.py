"""Vertex programs (SURVEY §2.2 A1–A4) with pinned semantics shared
with the executable stand-in oracle (tests/oracle_pregel.py)."""
