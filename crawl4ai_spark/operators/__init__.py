from . import dedup, scheduler, scrape, traversal  # noqa: F401
