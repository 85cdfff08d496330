"""Host-side utilities: logging, profiling, image assembly, assets, config."""
