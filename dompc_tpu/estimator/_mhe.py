"""Placeholder."""
MHE = None
