"""Pure-JAX geometry / uncertainty / post-processing ops."""
