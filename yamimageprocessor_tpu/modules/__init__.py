"""Built-in plugin modules (discovered via ``register_module``)."""
