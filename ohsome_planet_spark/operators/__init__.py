"""Relational operators (SURVEY.md §2): contribution synthesis, temporal
member merge, as-of join, spatial join, dedup family, similarity search."""
