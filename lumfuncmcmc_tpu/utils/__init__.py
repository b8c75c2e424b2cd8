"""Host-side utilities: IO, logging, synthetic catalogs, plotting."""
