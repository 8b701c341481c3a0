"""Host utilities: IO, preview, logging, config."""
