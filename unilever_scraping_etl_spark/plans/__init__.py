from .registry import QUERIES, QuerySpec  # noqa: F401
