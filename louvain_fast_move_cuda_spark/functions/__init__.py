from .modularity import community_weights, delta_q, modularity  # noqa: F401
