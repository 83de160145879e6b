from . import cluster_sweep, postfx  # noqa: F401
