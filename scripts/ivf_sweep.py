#!/usr/bin/env python
"""nprobe sweep for the IVF-flat ANN query: recall@10 vs brute force
per probe width, at k=floor(sqrt(N)).

Runs the DuckDB dialect: the driver's triple-green hash match proves
the Spark plan produces byte-identical results (same quantized
integers, same centroids, same tie-breaks), so the sweep is valid for
both engines while running in milliseconds.  Also reports the mean
candidate fraction scanned (the cost axis nprobe trades against).

Usage: python scripts/ivf_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from crystal_html5_spark.sparkjob.queries import (  # noqa: E402
    _ann_ivf_topk_sql,
    _emb_rowcount,
    _ivf_k,
    _ivf_nprobe,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = _emb_rowcount(sf_dir)
    k = _ivf_k(n)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM"
        f" read_parquet('{sf_dir}/embeddings.parquet')")

    brute = {r[0] for r in con.execute("""
        SELECT vec_id FROM (
          SELECT e.vec_id,
                 list_cosine_similarity(e.embedding, q.embedding) AS cos
          FROM embeddings e,
               (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        ) ORDER BY CAST(FLOOR(cos * 1000000000) AS BIGINT) DESC, vec_id
        LIMIT 10""").fetchall()}

    print(f"sf_dir={sf_dir} N={n} k={k} "
          f"default_nprobe={_ivf_nprobe(k)} (ceil(k/4))")
    print(f"{'nprobe':>6} {'recall@10':>9} {'cand_frac':>9}")
    sweep = sorted({1, 2, 4, _ivf_nprobe(k), k // 2, k})
    for nprobe in sweep:
        sql = _ann_ivf_topk_sql("duck", n, nprobe=nprobe)
        got = {r[0] for r in con.execute(sql).fetchall()}
        # candidate fraction: rows whose cell is probed
        cand_sql = sql.split("top AS")[0] + (
            "cnt AS (SELECT COUNT(*) c FROM cand) "
            "SELECT c FROM cnt")
        cand = con.execute(cand_sql).fetchone()[0]
        print(f"{nprobe:>6} {len(brute & got):>8}/10 {cand / n:>9.3f}")


if __name__ == "__main__":
    main()
