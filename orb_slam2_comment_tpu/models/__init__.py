"""Pipeline layer: frames, map state, tracking, local mapping, loop closing, system."""
