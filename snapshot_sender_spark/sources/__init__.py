from . import fixtures, listing  # noqa: F401
