from . import norms, init, stochastic, window  # noqa: F401
