"""louvain_fast_move_cuda_spark — a from-scratch PySpark-native link-graph engine.

Re-expresses the data-processing capabilities of the CUDA reference
``FedeFonto/louvain-fast-move-cuda`` (see /root/reference, SURVEY.md) as
Spark DataFrame programs: Louvain fast-local-move community detection with
graph coarsening, plus PageRank, connected components, label propagation and
triangle counting over an edge table derived from multi-turn conversation
transcript tables — never per-row Python, always Catalyst-friendly plans.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
