"""Host-side utilities: weight conversion, logging, visualization."""
