"""Multimodal binary-column operators (Phase 4 — filled in next)."""
