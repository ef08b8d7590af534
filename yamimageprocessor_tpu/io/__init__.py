"""Host IO: codecs, records, sidecars, lazy tiled sources."""
