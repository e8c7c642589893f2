from .registry import QUERIES, ORACLES, flagship  # noqa: F401
