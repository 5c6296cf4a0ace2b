"""Fixture/source generators."""
