"""Device mesh, tile sharding, halo exchange."""
