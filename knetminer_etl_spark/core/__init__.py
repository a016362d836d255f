from .model import *  # noqa: F401,F403
from .serialize import *  # noqa: F401,F403
