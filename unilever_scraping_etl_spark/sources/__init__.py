from . import extraction, fetcher, ingest, multimodal  # noqa: F401
