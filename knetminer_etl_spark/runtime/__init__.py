from . import checkpoint  # noqa: F401
from .session import get_session, session_from_config  # noqa: F401
