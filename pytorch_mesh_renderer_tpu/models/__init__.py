"""Model families: the hard and soft renderers, procedural shapes."""

from . import shapes  # noqa: F401
