from . import corpus, catalog  # noqa: F401
