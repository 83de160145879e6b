from . import common, preview, render  # noqa: F401
