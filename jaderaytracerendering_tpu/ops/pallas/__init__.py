from . import cluster_sweep, cluster_sweep2, postfx  # noqa: F401
