from . import camera, film, rng, vecmath  # noqa: F401
