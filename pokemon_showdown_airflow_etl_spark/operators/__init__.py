from . import metadata  # noqa: F401
from . import merge  # noqa: F401
from . import dedup  # noqa: F401
from . import similarity  # noqa: F401
from . import text  # noqa: F401
from . import multimodal  # noqa: F401
from . import skew  # noqa: F401
from . import bucketing  # noqa: F401
