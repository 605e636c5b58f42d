"""Metrics, eval protocol, schedules, weight IO, logging, misc utilities."""
