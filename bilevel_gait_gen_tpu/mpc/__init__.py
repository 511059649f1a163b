"""Subpackage: mpc."""
