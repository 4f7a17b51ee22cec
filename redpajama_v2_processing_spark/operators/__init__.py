"""Distributed operators (DataFrame -> DataFrame plans)."""
