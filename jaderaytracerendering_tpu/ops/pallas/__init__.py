from . import cluster_sweep  # noqa: F401
