"""Dataflow operators: cleaning, loads, search, dedup, similarity, text."""
