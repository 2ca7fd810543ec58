from . import relational, windows, aggregates  # noqa: F401
