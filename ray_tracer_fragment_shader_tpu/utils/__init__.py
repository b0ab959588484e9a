from . import jmath  # noqa: F401
from .checkpoint import restore_checkpoint, save_checkpoint  # noqa: F401
from .guards import assert_finite, checked_render  # noqa: F401
from .logging import JsonlLogger  # noqa: F401
from .profiling import RaysMeter, named_phase, trace  # noqa: F401
