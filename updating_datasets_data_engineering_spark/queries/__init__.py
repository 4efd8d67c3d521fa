"""Per-tier query modules (split from registry.py, VERDICT r6 item 7)."""
