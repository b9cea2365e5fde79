from . import scalars  # noqa: F401
from . import logparse  # noqa: F401
from . import metrics  # noqa: F401
