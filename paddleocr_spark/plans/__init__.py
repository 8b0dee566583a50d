"""Physical-plan inspection helpers (plan-quality gates)."""
