from . import urls, scorers, filters, hashing, text  # noqa: F401
