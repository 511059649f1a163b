"""Subpackage: sim."""
