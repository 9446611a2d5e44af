"""Placeholder."""
EKF = None
