"""End-to-end pipeline compositions (the reference's three entry points:
restructure, clean, service — Application.kt:100-144)."""
