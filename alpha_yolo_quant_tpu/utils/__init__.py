"""Shared utilities: artifact IO, logging, timing."""
