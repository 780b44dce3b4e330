"""SPMD parallelism: device meshes, shardings, collectives."""
