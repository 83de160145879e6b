from . import (  # noqa: F401
    envmap,
    hdr,
    material,
    objloader,
    procedural,
    scene,
    serialization,
    transforms,
)
