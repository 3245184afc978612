from .sessions import session_bounds, with_session_id
from .windows import with_window_id
from .features import extract_features

__all__ = ["with_session_id", "session_bounds", "with_window_id", "extract_features"]
