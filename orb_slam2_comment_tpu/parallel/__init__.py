"""Multi-chip scaling: device meshes and distributed bundle adjustment."""
