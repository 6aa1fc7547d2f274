"""Mux elements (reference mux/)."""
