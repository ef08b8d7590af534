"""High-level services: batch processing, data export, diagnostics."""
