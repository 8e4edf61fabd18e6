from .windows import session_windows, sliding_window_agg, tumbling_window_agg

__all__ = ["session_windows", "sliding_window_agg", "tumbling_window_agg"]
