"""Device-side compute ops (JAX/XLA/Pallas) for otters-tpu."""
