from . import host  # noqa: F401
from .host import GOLDILOCKS, BABYBEAR  # noqa: F401
