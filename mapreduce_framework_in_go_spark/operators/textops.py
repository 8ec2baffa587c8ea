"""Text analysis operators (Phase 4 — filled in next)."""
