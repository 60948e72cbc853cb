from . import delivery, http_sink, metrics, status  # noqa: F401
