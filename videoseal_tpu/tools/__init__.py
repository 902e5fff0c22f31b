"""Offline conversion tools (weights, configs)."""
