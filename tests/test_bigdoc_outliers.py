"""Document-length outliers: the fixtures' documents are short, so a
kernel whose per-document cost is quadratic in token count looks fine
in every driver hash and bench run — until one real-corpus outlier doc
stalls an executor.  The r13 probe that introduced this suite found
exactly that: a raw split(text) expression closed over by a transform
lambda is re-evaluated PER ELEMENT (105.7 s -> 0.44 s on a 40k-token
doc once staged as a column), hitting llm_winnow_fingerprint,
llm_dedup_incremental's sketch staging and llm_pipeline_end_to_end's
shingles.

Two guards: oracle parity on a mirror carrying 8k-token outlier docs
(oracle-affordable sizes — the DuckDB list kernels are themselves
super-linear and blow past 10 min / 40 GB at 120k tokens, a harness
cost, not an engine one), and a growth-ratio pin on the winnow kernel
(10x tokens must cost < 8x time; the quadratic form measured ~16x)."""

from __future__ import annotations

import time

import duckdb
import pytest

from data_eng_iceberg_demo_spark.plans.registry import (REGISTRY,
                                                        _load_all_modules)

import importlib.util as _ilu
import os as _os

_spec = _ilu.spec_from_file_location(
    "oracle_parity_helpers_big",
    _os.path.join(_os.path.dirname(__file__), "test_oracle_parity.py"))
_mod = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
canon = _mod.canon

_load_all_modules()

# queries with corpus-shaped text kernels AND oracles that stay
# affordable on an 8k-token doc
BIGDOC_SAMPLE = [
    "llm_text_stats", "llm_token_count", "llm_docs_to_chunks",
    "llm_dedup_near", "llm_tfidf_terms", "llm_bm25_topk",
    "llm_bpe_pair_counts", "llm_winnow_fingerprint",
    "llm_pipeline_end_to_end", "llm_dedup_incremental",
]


@pytest.fixture(scope="module")
def bigdoc_sf_dir(tmp_path_factory, sf_dir):
    dst = tmp_path_factory.mktemp("sf_bigdoc")
    big1 = ("lorem ipsum dolor sit amet " * 1600).strip()  # 8k tokens
    big2 = "tok" + " tok" * 7999                           # 8k identical
    con = duckdb.connect()
    con.execute(f"""COPY (
      SELECT * FROM read_parquet('{sf_dir}/documents.parquet')
      UNION ALL SELECT 930001, ?, 'en', 'srcbig', ?
      UNION ALL SELECT 930002, ?, 'en', 'srcbig', ?
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""",
                [big1, len(big1), big2, len(big2)])
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "embeddings"):
        con.sql(f"COPY (SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
    con.close()
    return str(dst)


@pytest.fixture(scope="module")
def bigdoc_duck(bigdoc_sf_dir):
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{bigdoc_sf_dir}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", BIGDOC_SAMPLE)
def test_text_query_parity_on_outlier_docs(driver_spark, bigdoc_sf_dir,
                                           bigdoc_duck, name):
    spec = REGISTRY[name]
    got = canon(spec.fn(driver_spark, bigdoc_sf_dir).toPandas())
    want = canon(bigdoc_duck.execute(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    if not got.equals(want):
        import pandas as pd
        diff = (got != want).any(axis=1)
        sample = pd.concat([got[diff].head(4).assign(side="spark"),
                            want[diff].head(4).assign(side="oracle")])
        raise AssertionError(f"{name}: big-doc divergence\n{sample.to_string()}")


def _winnow_secs(spark, tmp_path, n_tokens: int) -> float:
    """Time the winnow kernel on a single synthetic n-token document
    staged as a parquet fixture dir (so the registry fn runs its real
    path, split included)."""
    import pandas as pd
    d = tmp_path / f"wf{n_tokens}"
    d.mkdir()
    txt = " ".join(f"w{i % 97}x{i % 13}" for i in range(n_tokens))
    pd.DataFrame({"doc_id": [1], "text": [txt], "lang": ["en"],
                  "source": ["s"], "n_chars": [len(txt)]}) \
        .to_parquet(d / "documents.parquet")
    fn = REGISTRY["llm_winnow_fingerprint"].fn
    fn(spark, str(d)).collect()            # warm codegen for this shape
    t0 = time.time()
    fn(spark, str(d)).collect()
    return time.time() - t0


def test_winnow_kernel_scales_linearly(spark, tmp_path):
    """10x the tokens must cost well under 8x the time.  The unstaged-
    lambda quadratic form measured ~16x here; the staged form ~1-3x
    (fixed per-query overhead dominates).  Generous margin for shared-
    host noise."""
    t_small = _winnow_secs(spark, tmp_path, 2_000)
    t_big = _winnow_secs(spark, tmp_path, 20_000)
    assert t_big < max(8 * t_small, 5.0), (
        f"winnow kernel super-linear: 2k tokens {t_small:.2f}s, "
        f"20k tokens {t_big:.2f}s")
