from . import preview, render, sampling, wavefront  # noqa: F401
