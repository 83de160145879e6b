from . import bvh, native  # noqa: F401
