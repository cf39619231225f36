from . import relational  # noqa: F401
