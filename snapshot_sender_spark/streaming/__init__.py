from . import delivery_stream, windows  # noqa: F401
