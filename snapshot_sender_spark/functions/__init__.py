from . import crypto, text, vectors  # noqa: F401
