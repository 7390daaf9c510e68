"""Reusable DataFrame→DataFrame operators (engine library surface)."""
