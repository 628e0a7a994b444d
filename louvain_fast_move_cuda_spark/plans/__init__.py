from .checkpoint import (  # noqa: F401
    SuperstepCheckpointer,
    SuperstepState,
    VertexIterationCheckpointer,
)
from .skew import salted_sum_by_key, skewed_degree_trigger  # noqa: F401
