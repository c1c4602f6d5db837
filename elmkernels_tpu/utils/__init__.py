"""Host-side utilities: calendar, golden-file IO, domain decomposition."""
