"""Self-compiled native kernels (optional; see functions/native_kernels.py)."""
