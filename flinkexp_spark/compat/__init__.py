"""Optional-dependency compatibility probes (sandbox-aware, no pip)."""
