"""Structured Streaming composition of the batch operators (SURVEY.md §2.8,
Phase 3): events replayer source, foreachBatch merge sink, stateful
liveness. Streaming reuses the exact batch functions
(ingest.perpoint_state / merge_perpoint_states / snapshot_from_state), so
replayed results are the same computation as the flagship query."""
