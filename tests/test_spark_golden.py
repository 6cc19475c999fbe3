"""The full golden tree-construction suite through the SPARK path.

Every html5lib/WebKit .dat case (documents and fragments, scripting
on/off) is shipped through mapInArrow; the UDF parses and dumps the tree
in html5lib format, and the driver compares against the golden dump.
This is the north-star invariant — byte-identical parse behavior on the
reference's own fixtures — evidenced end-to-end through Spark, not just
in-process."""

import pathlib

import pytest

pyspark = pytest.importorskip("pyspark")

from crystal_html5_spark.html5x.testsupport import read_dat_file  # noqa: E402
from crystal_html5_spark.sparkjob.session import get_spark  # noqa: E402

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def _all_cases():
    cases = []
    for sub in ("treedata", "treedata_more"):
        for f in sorted((FIXTURES / sub).glob("*.dat")):
            cases.extend(read_dat_file(str(f)))
    return cases


def _dump_batches(iterator):
    import pyarrow as pa

    from crystal_html5_spark.html5x.testsupport import TreeTestCase, run_tree_case

    for batch in iterator:
        ids = batch.column("case_id").to_pylist()
        texts = batch.column("text").to_pylist()
        contexts = batch.column("context").to_pylist()
        scripting = batch.column("scripting").to_pylist()
        dumps = []
        for t, c, s in zip(texts, contexts, scripting):
            ta = TreeTestCase(text=t, context=c, scripting=s)
            try:
                _, got = run_tree_case(ta)
            except Exception as ex:  # noqa: BLE001
                got = f"<<error: {type(ex).__name__}: {ex}>>"
            dumps.append(got)
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids, pa.int32()), pa.array(dumps, pa.string())],
            names=["case_id", "dump"],
        )


def test_golden_suite_via_spark():
    cases = _all_cases()
    spark = get_spark("golden-spark", master="local[8]",
                      shuffle_partitions=8)
    try:
        rows = [
            (i, c.text, c.context, c.scripting) for i, c in enumerate(cases)
        ]
        df = spark.createDataFrame(
            rows, "case_id int, text string, context string, scripting boolean"
        ).repartition(16)
        out = df.mapInArrow(_dump_batches, "case_id int, dump string")
        got = {r["case_id"]: r["dump"] for r in out.collect()}
        assert len(got) == len(cases)
        mismatches = [
            (i, cases[i].fname, cases[i].index)
            for i in range(len(cases))
            if got[i] != cases[i].want
        ]
        assert not mismatches, f"{len(mismatches)} mismatches: {mismatches[:5]}"
    finally:
        spark.stop()


def test_token_golden_via_spark():
    """The 82 tokenizer golden cases through mapInArrow: the UDF
    serializes the token stream ('$'-joined) and the driver compares to
    the golden strings."""
    import json

    cases = json.loads(
        (FIXTURES / "token_tests.json").read_text()
    )

    def tokenize_batches(iterator):
        import pyarrow as pa

        from crystal_html5_spark.html5x import tokenizer as tk

        for batch in iterator:
            ids = batch.column("case_id").to_pylist()
            htmls = batch.column("html").to_pylist()
            outs = []
            for h in htmls:
                z = tk.Tokenizer(h.encode("utf-8"))
                parts = []
                while z.next() != tk.ERROR:
                    parts.append(str(z.token()))
                outs.append("$".join(parts))
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, pa.int32()), pa.array(outs, pa.string())],
                names=["case_id", "stream"],
            )

    spark = get_spark("token-golden", master="local[4]",
                      shuffle_partitions=4)
    try:
        df = spark.createDataFrame(
            [(i, c["html"]) for i, c in enumerate(cases)],
            "case_id int, html string",
        ).repartition(4)
        got = {
            r["case_id"]: r["stream"]
            for r in df.mapInArrow(
                tokenize_batches, "case_id int, stream string"
            ).collect()
        }
        for i, c in enumerate(cases):
            assert got[i] == c["golden"], c["desc"]
    finally:
        spark.stop()
