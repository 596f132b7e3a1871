"""Scalar function surface (SURVEY.md §2.7).

Everything here is either a native Spark Column expression builder or a
vectorized numpy kernel used inside Arrow-batched pandas UDFs.
"""
