from . import delivery, status  # noqa: F401
