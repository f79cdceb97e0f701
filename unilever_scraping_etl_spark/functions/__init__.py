from . import scalars, text, vectors  # noqa: F401
