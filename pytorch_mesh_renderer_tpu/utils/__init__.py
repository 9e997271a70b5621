"""Host-side utilities: OBJ IO, images, debugging."""

from . import debug, obj_io  # noqa: F401
