from .norms import Norm, make_norm  # noqa: F401
from .factories import get_act, get_norm_spec  # noqa: F401
