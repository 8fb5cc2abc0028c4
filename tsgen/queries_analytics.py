"""Populated in a later stage."""
