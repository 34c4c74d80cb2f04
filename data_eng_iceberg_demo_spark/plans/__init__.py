from .registry import REGISTRY, QuerySpec, flagship, oracle_map, query_map, register  # noqa: F401
