"""Host codec layer (L4'): pure-Python/NumPy codecs replacing the
reference's codec crates (claxon, lewton, ffv1, ...)."""
