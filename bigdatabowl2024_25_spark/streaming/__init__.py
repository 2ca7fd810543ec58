from . import replay  # noqa: F401
