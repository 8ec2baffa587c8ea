"""Similarity search operators (Phase 4 — filled in next)."""
