from .registry import QUERIES, ORACLES, query  # noqa: F401
