"""Deterministic test fixtures (committed to the repo; regenerate with
`python tests/fixtures/gen_fixtures.py`).

1. pedidos.csv.gz — the reference's table schema (README.md:167-175) in its
   CSV ingest format (';' delimiter, header, gzip — README.md:186-193).
   The original dataset repo (README.md:138) is unreachable offline, so
   this is a seeded equivalent: ~1,000 rows, several uf='SP' rows for the
   DELETE fixture (README.md:231).
2. events_sample.jsonl — JSON-lines sample derived from the sf0.001 events
   table (ts serialized as a string to sidestep ns-precision drift).
"""

from __future__ import annotations

import csv
import gzip
import io
import json
import os
import random
from datetime import datetime, timedelta

HERE = os.path.dirname(os.path.abspath(__file__))

PRODUTOS = ["notebook", "celular", "geladeira", "fogao", "tv", "monitor",
            "teclado", "mouse", "cadeira", "mesa"]
UFS = ["SP", "RJ", "MG", "RS", "PR", "BA", "PE", "CE", "SC", "GO"]


def gen_pedidos(path: str, n: int = 1000, seed: int = 42) -> None:
    rng = random.Random(seed)
    base = datetime(2024, 1, 1, 0, 0, 0)
    buf = io.StringIO()
    w = csv.writer(buf, delimiter=";")
    w.writerow(["id_pedido", "produto", "valor_unitario", "quantidade",
                "data_criacao", "uf", "id_cliente"])
    for i in range(n):
        w.writerow([
            f"ped-{i:06d}-{rng.randrange(16**8):08x}",
            rng.choice(PRODUTOS),
            f"{rng.randrange(100, 500000) / 100:.2f}",
            rng.randrange(1, 10),
            (base + timedelta(seconds=rng.randrange(0, 90 * 24 * 3600)))
            .strftime("%Y-%m-%d %H:%M:%S"),
            rng.choice(UFS),
            rng.randrange(1, 10000),
        ])
    with open(path, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
            f.write(buf.getvalue().encode())


def gen_events_jsonl(path: str, src: str = "/root/testdata/sf0.001/events.parquet",
                     n: int = 200) -> None:
    import pyarrow.parquet as pq

    t = pq.read_table(src).to_pandas().sort_values("event_id").head(n)
    with open(path, "w") as f:
        for _, r in t.iterrows():
            f.write(json.dumps({
                "event_id": int(r.event_id),
                "event_type": str(r.event_type),
                "value": float(r.value),
                "ts_s": r.ts.strftime("%Y-%m-%d %H:%M:%S"),
            }) + "\n")


if __name__ == "__main__":
    gen_pedidos(os.path.join(HERE, "pedidos.csv.gz"))
    gen_events_jsonl(os.path.join(HERE, "events_sample.jsonl"))
    print("fixtures written to", HERE)
