"""Quarantined superseded kernel generations (see each module)."""
