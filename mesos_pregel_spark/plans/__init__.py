"""Superstep orchestration, lineage control, checkpoint/resume."""
