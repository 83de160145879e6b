from . import bruteforce, intersect, traverse  # noqa: F401
