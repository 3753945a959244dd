"""Compute kernels: geometry, feature extraction, matching, solvers, optimizers."""
