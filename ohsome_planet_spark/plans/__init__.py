"""Query plans surfaced through ``__spark_entry__`` (driver contract)."""
