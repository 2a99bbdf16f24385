"""Host streaming runtime: drivers, ring buffers, native bindings."""
