"""Streaming is an explicit non-goal (SURVEY §2.5): the contract's
input is a static Iceberg snapshot of transcripts; incremental edge
maintenance would be an Iceberg ``MERGE INTO`` of new
consecutive-turn links followed by a re-run from the last checkpoint.
This package exists to mark that boundary; no streaming operators are
part of the capability set."""
