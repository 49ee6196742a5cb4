from . import intervals, seq  # noqa: F401
