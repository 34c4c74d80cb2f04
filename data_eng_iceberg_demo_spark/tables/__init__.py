from .icelite import IceliteCatalog, IceliteTable  # noqa: F401
