from . import config, logging  # noqa: F401
