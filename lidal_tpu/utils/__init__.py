"""Metrics and IO utilities."""
