"""Subpackage: control."""
