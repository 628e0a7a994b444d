from .louvain import LouvainResult, louvain  # noqa: F401
from .pagerank import pagerank, personalized_pagerank  # noqa: F401
from .distances import (  # noqa: F401
    closeness_centrality,
    ego_networks,
    harmonic_centrality,
    landmark_distances,
    stress_centrality,
    weighted_landmark_distances,
)
from .graphstats import coreness, katz_centrality, rich_club  # noqa: F401
from .coloring import greedy_coloring  # noqa: F401
from .matching import greedy_weighted_matching, maximal_matching  # noqa: F401
from .mis import maximal_independent_set  # noqa: F401
from .mst import minimum_spanning_forest  # noqa: F401
from .walks import (  # noqa: F401
    index_neighbors,
    index_weighted_neighbors,
    node2vec_walks,
    random_walks,
    sample_neighbors,
    skipgram_pairs,
    weighted_random_walks,
)
from .components import connected_components  # noqa: F401
from .labelprop import label_propagation  # noqa: F401
from .triangles import triangle_count, triangles_per_vertex  # noqa: F401
