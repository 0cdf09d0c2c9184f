__all_models__ = [
    "graph-network",
    "transformer",
    "equivariant-transformer",
    "tensornet",
    "tensornet2",
]
