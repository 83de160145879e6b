from . import image_io, tonemap  # noqa: F401
