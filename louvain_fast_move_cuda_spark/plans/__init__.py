from .checkpoint import SuperstepCheckpointer, SuperstepState  # noqa: F401
from .skew import salted_sum_by_key  # noqa: F401
