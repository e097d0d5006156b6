"""The six metric implementations (pure-functional JAX kernels + thin classes)."""
