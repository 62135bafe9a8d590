from . import math as math_utils  # noqa: F401
from . import pe  # noqa: F401
from . import meshops  # noqa: F401
from . import sampling  # noqa: F401
