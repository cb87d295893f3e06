"""Structured Streaming service mode (SURVEY O27/M5)."""
