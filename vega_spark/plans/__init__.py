"""Physical-plan inspection utilities."""
