"""Pregel engine primitives (SURVEY §2.1 P1–P5, §2.4 S1–S2).

Each primitive is a declarative DataFrame transformation; Catalyst
chooses the physical strategy (map-side partial aggregation stands in
for Pregel combiners, hash-partitioned shuffle for message routing).
"""
