from .transcripts import synthesize_transcripts, transcripts_from_events  # noqa: F401
from .edges import (  # noqa: F401
    assign_contiguous_ids,
    build_graph,
    canonicalize_edges,
    derive_edges_from_transcripts,
    symmetrize,
    vertex_weights,
)
from .edgefile import edge_file_graph, read_edge_file  # noqa: F401
