"""KV/state tier (Phase 3 — filled in next)."""
