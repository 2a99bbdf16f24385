"""Multi-device distribution: meshes, sharded steps, history exchange."""
