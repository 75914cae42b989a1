"""Scalar/vectorized function kernels (string norm, similarity, ensemble)."""
