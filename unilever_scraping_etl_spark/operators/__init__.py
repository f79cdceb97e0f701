from . import dedup, quarantine, relational, similarity  # noqa: F401
