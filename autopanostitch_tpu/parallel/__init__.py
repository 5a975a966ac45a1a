"""Multi-chip sharding: device meshes, sharded matching, canvas-tile sharding."""
