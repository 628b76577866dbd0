"""Maintenance + time-travel operations (SURVEY §2.1 S11-S12)."""
