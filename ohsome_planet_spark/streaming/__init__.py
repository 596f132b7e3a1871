"""Incremental / replication operators (SURVEY.md §2.8)."""
