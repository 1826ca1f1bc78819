"""Relational operators as pure DataFrame -> DataFrame functions."""
