"""SQL dialect shim: run the reference tutorial's Iceberg SQL verbatim
against icelite tables (README.md:155-328).

The real Iceberg stack injects a Spark session extension for `CALL`,
`VERSION AS OF` and `ADD PARTITION FIELD` syntax (README.md:66); that jar
is uninstallable offline (SURVEY.md §0), so this shim routes exactly those
statement shapes to the icelite Python API and passes everything else to
stock ``spark.sql``.  Table references like ``db.pedidos`` in plain
SELECTs are rewritten to temp views over the table's current (or
time-traveled) snapshot — the user-visible behavior of the tutorial's
session, statement for statement (verified by
tests/test_reference_replay.py).

This is intentionally a statement ROUTER, not a SQL parser: each handled
shape is one anchored regex; anything unmatched is stock Spark SQL.
"""

from __future__ import annotations

import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .icelite import IceliteCatalog

_INTERVAL_S = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _split_top_commas(s: str) -> list[str]:
    """Split an assignment list on commas at paren depth 0, so
    ``SET a = round(x, 2), b = 1`` parses as two assignments."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p for p in (p.strip() for p in parts) if p]


class IceliteSqlSession:
    """``sql(text)`` entry point with the Iceberg statement surface the
    reference tutorial uses."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.catalog = IceliteCatalog(spark, warehouse_dir)
        self._tables: dict[str, object] = {}

    def _table(self, name: str):
        if name not in self._tables:
            self._tables[name] = self.catalog.load_table(name)
        return self._tables[name]

    def sql(self, text: str) -> DataFrame | None:
        s = text.strip().rstrip(";").strip()
        # strip line comments (the tutorial annotates statements)
        s = "\n".join(ln for ln in s.splitlines()
                      if not ln.strip().startswith("--")).strip()

        m = re.match(r"CREATE\s+SCHEMA\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)$",
                     s, re.I)
        if m:
            self.catalog.create_namespace(m.group(1))
            return None

        m = re.match(
            r"CREATE\s+TABLE\s+([\w.]+)\s*\((.*)\)\s*USING\s+iceberg"
            r"(?:\s+TBLPROPERTIES\s*\((.*)\))?$", s, re.I | re.S)
        if m:
            name, cols, props_s = m.groups()
            schema = StructType.fromDDL(cols)
            props = dict(re.findall(r"'([^']+)'\s*=\s*'([^']+)'",
                                    props_s or ""))
            self._tables[name] = self.catalog.create_table(
                name, schema, props or None)
            return None

        m = re.match(r"INSERT\s+INTO\s+([\w.]+)\s+(SELECT\b.*)$", s, re.I | re.S)
        if m:
            name, select = m.groups()
            self._table(name).insert(self.spark.sql(select))
            return None

        m = re.match(r"DELETE\s+FROM\s+([\w.]+)\s+WHERE\s+(.*)$", s, re.I | re.S)
        if m:
            name, pred = m.groups()
            self._table(name).delete_where(pred)
            return None

        m = (re.match(r"UPDATE\s+([\w.]+)\s+SET\s+(.*?)\s+WHERE\s+(.*)$",
                      s, re.I | re.S)
             or re.match(r"UPDATE\s+([\w.]+)\s+SET\s+(.*)()$", s, re.I | re.S))
        if m:
            name, sets, pred = m.groups()
            pred = pred or "true"
            assignments = {}
            for part in _split_top_commas(sets):
                col, expr_s = part.split("=", 1)
                assignments[col.strip()] = expr_s.strip()
            self._table(name).update_where(pred, assignments)
            return None

        m = re.match(
            r"MERGE\s+INTO\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+"
            r"USING\s+([\w.]+)(?:\s+(?:AS\s+)?(\w+))?\s+"
            r"ON\s+[\w.]+\.(\w+)\s*=\s*[\w.]+\.(\w+)\s+"
            r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+(.*?)\s+"
            r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*$",
            s, re.I | re.S)
        if m:
            name, _talias, src, _salias, k1, k2, sets = m.groups()
            if k1 != k2:
                raise ValueError(
                    f"MERGE join keys must match by name: {k1} vs {k2}")
            update_cols = [part.split("=", 1)[0].strip().split(".")[-1]
                           for part in _split_top_commas(sets)]
            source = (self._table(src).read() if src in self._tables
                      else self.spark.table(src))
            self._table(name).merge_into(source, k1, update_cols)
            return None

        m = re.match(r"ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+COLUMN\s+(\w+)\s+(\w+(?:\(.*\))?)$",
                     s, re.I)
        if m:
            name, col, typ = m.groups()
            self._table(name).add_column(col, typ.lower())
            return None

        m = re.match(r"ALTER\s+TABLE\s+([\w.]+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)$",
                     s, re.I)
        if m:
            name, old, new = m.groups()
            self._table(name).rename_column(old, new)
            return None

        m = re.match(r"ALTER\s+TABLE\s+([\w.]+)\s+DROP\s+COLUMN\s+(\w+)$", s, re.I)
        if m:
            self._table(m.group(1)).drop_column(m.group(2))
            return None

        m = re.match(r"ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+PARTITION\s+FIELD\s+"
                     r"(days|months|years|hours)\s*\(\s*(\w+)\s*\)$", s, re.I)
        if m:
            name, transform, col = m.groups()
            self._table(name).set_partition(transform.lower(), col)
            return None

        m = re.match(r"ALTER\s+TABLE\s+([\w.]+)\s+ADD\s+PARTITION\s+FIELD\s+"
                     r"(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)$",
                     s, re.I)
        if m:
            name, transform, param, col = m.groups()
            self._table(name).set_partition(transform.lower(), col,
                                            param=int(param))
            return None

        m = re.match(r"ALTER\s+TABLE\s+([\w.]+)\s+SET\s+TBLPROPERTIES\s*"
                     r"\((.*)\)$", s, re.I | re.S)
        if m:
            name, props_s = m.groups()
            t = self._table(name)
            for k, v in re.findall(r"'([^']+)'\s*=\s*'([^']+)'", props_s):
                t.set_property(k, v)
            return None

        m = re.match(r"CALL\s+(?:\w+\.)?system\.expire_snapshots\s*\(\s*'([\w.]+)'"
                     r"(.*)\)$", s, re.I | re.S)
        if m:
            name, args = m.groups()
            retain = re.search(r"retain_last\s*=>\s*(\d+)", args, re.I)
            older = re.search(
                r"older_than\s*=>\s*NOW\(\)\s*-\s*INTERVAL\s*'(\d+)'\s*(\w+)",
                args, re.I)
            older_ts = (time.time()
                        - int(older.group(1)) * _INTERVAL_S[older.group(2).upper()]
                        if older else None)
            self._table(name).expire_snapshots(
                older_than_ts=older_ts,
                retain_last=int(retain.group(1)) if retain else 1)
            return None

        m = re.match(r"CALL\s+(?:\w+\.)?system\.rewrite_data_files\s*\(\s*"
                     r"table\s*=>\s*'([\w.]+)'\s*\)$", s, re.I)
        if m:
            self._table(m.group(1)).rewrite_data_files()
            return None

        m = re.match(r"CALL\s+(?:\w+\.)?system\.remove_orphan_files\s*\(\s*"
                     r"(?:table\s*=>\s*)?'([\w.]+)'\s*\)$", s, re.I)
        if m:
            removed = self._table(m.group(1)).remove_orphan_files()
            return self.spark.createDataFrame(
                [(p,) for p in removed], "orphan_file_location string")

        m = re.match(r"CALL\s+(?:\w+\.)?system\.rollback_to_snapshot\s*\(\s*"
                     r"'([\w.]+)'\s*,\s*(\d+)\s*\)$", s, re.I)
        if m:
            self._table(m.group(1)).rollback_to_snapshot(int(m.group(2)))
            return None

        m = re.match(r"ALTER\s+TABLE\s+([\w.]+)\s+CREATE\s+(TAG|BRANCH)\s+"
                     r"(\w+)$", s, re.I)
        if m:
            name, kind, ref = m.groups()
            t = self._table(name)
            (t.create_tag if kind.upper() == "TAG" else t.create_branch)(ref)
            return None

        m = re.match(r"CALL\s+(?:\w+\.)?system\.fast_forward\s*\(\s*"
                     r"'([\w.]+)'\s*,\s*'(\w+)'\s*\)$", s, re.I)
        if m:
            self._table(m.group(1)).fast_forward(m.group(2))
            return None

        # SELECT path: resolve <table>.history, VERSION AS OF, and plain
        # icelite table references via temp views, then delegate
        return self.spark.sql(self._rewrite_select(s))

    def _rewrite_select(self, s: str) -> str:
        for name in self._known_tables():
            view = "__icelite_" + name.replace(".", "_")
            t = self._table(name)
            hist = re.compile(rf"\b{re.escape(name)}\.history\b", re.I)
            if hist.search(s):
                t.history().createOrReplaceTempView(view + "_history")
                s = hist.sub(view + "_history", s)
            # metadata tables: SELECT * FROM db.t.files / db.t.partitions
            # (Iceberg's inspection surface, same spelling)
            for mname, mdf in (("files", t.files), ("partitions", t.partitions),
                               ("refs", t.refs_df),
                               ("manifests", t.manifests)):
                mpat = re.compile(rf"\b{re.escape(name)}\.{mname}\b", re.I)
                if mpat.search(s):
                    mdf().createOrReplaceTempView(f"{view}_{mname}")
                    s = mpat.sub(f"{view}_{mname}", s)
            tt = re.compile(
                rf"\b{re.escape(name)}\s+VERSION\s+AS\s+OF\s+(\d+)", re.I)
            mv = tt.search(s)
            if mv:
                ver = int(mv.group(1))
                t.read(version=ver).createOrReplaceTempView(
                    f"{view}_v{ver}")
                s = tt.sub(f"{view}_v{ver}", s)
            tr = re.compile(
                rf"\b{re.escape(name)}\s+VERSION\s+AS\s+OF\s+'(\w+)'", re.I)
            mr = tr.search(s)
            if mr:  # named ref (tag/branch) time travel
                ref = mr.group(1)
                t.read(ref=ref).createOrReplaceTempView(f"{view}_r_{ref}")
                s = tr.sub(f"{view}_r_{ref}", s)
            ref = re.compile(rf"\b{re.escape(name)}\b")
            if ref.search(s):
                t.read().createOrReplaceTempView(view)
                s = ref.sub(view, s)
        return s

    def _known_tables(self) -> list[str]:
        import os

        known = set(self._tables)
        base = self.catalog.base_dir
        for root, _dirs, files in os.walk(base):
            if "metadata.json" in files:
                rel = os.path.relpath(root, base)
                known.add(rel.replace(os.sep, "."))
        # longest names first so t.history resolves before t
        return sorted(known, key=len, reverse=True)
