from . import norms, init, window  # noqa: F401
