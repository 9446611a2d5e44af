"""Placeholder."""
EstimatorSettings = None
MHESettings = None
