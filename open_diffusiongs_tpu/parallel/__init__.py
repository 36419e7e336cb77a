"""Device meshes, sharding rules, and pjit train/eval step factories."""
