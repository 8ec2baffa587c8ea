"""Relational operator registry (Phase 2 — filled in next)."""
