from .readers import TABLES, load, load_all, read_csv, read_json_lines  # noqa: F401
