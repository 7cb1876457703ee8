"""Compute kernels: ray setup, reference jnp marcher, Pallas kernels, atlas."""
