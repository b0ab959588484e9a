from . import jmath  # noqa: F401
