"""Host-side core services (no jax imports at module import time)."""
