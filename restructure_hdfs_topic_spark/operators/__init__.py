"""Dataflow operators (SURVEY §2 inventory + north-star extensions)."""
