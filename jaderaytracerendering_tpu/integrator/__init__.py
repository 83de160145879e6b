from . import render, sampling, wavefront  # noqa: F401
