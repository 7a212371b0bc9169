"""Distributed-vs-single-node golden tests (the BASELINE.json:6 gate):
the Spark pipeline's per-url SHA-256 must be byte-identical to the pure
single-node kernel on the same synthesized pages, under any partitioning,
and the job must be checkpoint-resumable without duplicates.
"""

from __future__ import annotations

import shutil

import pytest

from pdf_extract_spark.fixtures import pages
from pdf_extract_spark.kernels.decode import decode_payload, text_sha256
from pdf_extract_spark.operators.extract import extract_text
from pdf_extract_spark.plans.pipeline import (
    extracted_ok,
    final_digest,
    quarantine,
    run_extraction,
)

N_PAGES = 400


@pytest.fixture(scope="module")
def golden():
    """Single-node kernel run — the oracle. url → (sha or None, error)."""
    out = {}
    for row in pages.make_rows(N_PAGES):
        url, _, payload, _, _ = row
        text, err = decode_payload(payload)
        out[url] = (text_sha256(text) if text is not None else None, err)
    return out


@pytest.fixture(scope="module")
def pages_sdf(spark):
    return spark.createDataFrame(pages.make_rows(N_PAGES),
                                 schema=pages.PAGES_SCHEMA)


def _collect_shas(df):
    return {r["url"]: (r["text_sha256"], r["error"])
            for r in df.select("url", "text_sha256", "error").collect()}


def test_spark_extract_matches_golden(spark, pages_sdf, golden):
    got = _collect_shas(extract_text(pages_sdf, num_partitions=8))
    assert got == golden


def test_partitioning_invariance(spark, pages_sdf, golden):
    """Byte-identity must hold for any partition count / layout."""
    for p in (1, 3, 16):
        got = _collect_shas(extract_text(pages_sdf.repartition(p),
                                         num_partitions=p))
        assert got == golden, f"divergence at partitions={p}"


def test_error_taxonomy(spark, pages_sdf, golden):
    got = _collect_shas(extract_text(pages_sdf, num_partitions=4))
    errs = {e for _, e in got.values() if e}
    assert "empty_payload" in errs
    assert "invalid_utf8" in errs
    assert "truncated_pdf" in errs
    n_err = sum(1 for _, e in got.values() if e)
    assert 0 < n_err < N_PAGES * 0.1


def test_resume_no_duplicates(spark, tmp_path_factory, golden):
    """Kill-after-partial simulation: run on a prefix, then resume with the
    full input; final table must equal a from-scratch run (same digest),
    with no duplicate urls and lineage metrics accounting for every row."""
    base = str(tmp_path_factory.mktemp("resume"))
    full = spark.createDataFrame(pages.make_rows(N_PAGES), schema=pages.PAGES_SCHEMA)
    prefix = spark.createDataFrame(pages.make_rows(250), schema=pages.PAGES_SCHEMA)

    out_a = f"{base}/a"
    run_extraction(spark, prefix, out_a, run_id="r1", num_partitions=4)
    stats = run_extraction(spark, full, out_a, run_id="r2", num_partitions=4)
    assert stats["n_in"] == N_PAGES - 250  # only the remainder was processed

    out_b = f"{base}/b"
    run_extraction(spark, full, out_b, run_id="scratch", num_partitions=4)

    df_a = extracted_ok(spark, out_a)
    assert df_a.count() == df_a.select("url").distinct().count()
    assert final_digest(spark, out_a) == final_digest(spark, out_b)

    lineage = spark.read.parquet(f"{out_a}/lineage")
    rows = lineage.groupBy().sum("n_in", "n_err").collect()[0]
    assert rows["sum(n_in)"] == N_PAGES  # 250 in r1 + 150 in r2, no overlap

    n_golden_err = sum(1 for _, e in golden.values() if e)
    assert quarantine(spark, out_a).count() == n_golden_err

    shutil.rmtree(base, ignore_errors=True)


def test_rerun_when_complete_is_noop(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("noop"))
    df = spark.createDataFrame(pages.make_rows(100), schema=pages.PAGES_SCHEMA)
    run_extraction(spark, df, base, run_id="r1", num_partitions=2)
    d1 = final_digest(spark, base)
    stats = run_extraction(spark, df, base, run_id="r2", num_partitions=2)
    assert stats["n_in"] == 0
    assert final_digest(spark, base) == d1
    shutil.rmtree(base, ignore_errors=True)


def test_writer_seam_swaps_output_format(spark, tmp_path_factory):
    """The output-format seam: run_extraction writes through the injected
    writer exactly once per run, and the commit protocol (lineage marker,
    resume) is unchanged by the indirection."""
    from pdf_extract_spark.plans.pipeline import ParquetRunWriter

    base = str(tmp_path_factory.mktemp("seam"))

    calls = []

    class RecordingWriter(ParquetRunWriter):
        def write_run(self, ext):
            calls.append(sorted(ext.columns))
            super().write_run(ext)

    df = spark.createDataFrame(pages.make_rows(80), schema=pages.PAGES_SCHEMA)
    w = RecordingWriter(f"{base}/extracted")
    run_extraction(spark, df, base, run_id="r1", num_partitions=2, writer=w)
    assert len(calls) == 1
    assert {"url", "run_id", "status", "text_sha256",
            "partition_id"} <= set(calls[0])
    # resume through the seam: nothing left to process, digest stable
    d1 = final_digest(spark, base)
    stats = run_extraction(spark, df, base, run_id="r2",
                           num_partitions=2, writer=w)
    assert stats["n_in"] == 0 and len(calls) == 2
    assert final_digest(spark, base) == d1
    shutil.rmtree(base, ignore_errors=True)


def test_iceberg_writer_requires_configured_catalog(spark):
    """IcebergRunWriter must fail AT CONSTRUCTION with the exact launch
    flags when the catalog is absent (this sandbox cannot ship the
    runtime jar — SCALE.md waiver), not at write time on an executor."""
    import pytest as _pytest

    from pdf_extract_spark.plans.pipeline import IcebergRunWriter

    with _pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergRunWriter(spark, "nocat.db.extracted")


def test_salted_repartition_balances_oversized_tail(spark):
    """O7 skew evidence: with a heavy oversized tail, salted partitioning
    must cap the max partition byte load near the mean; naive url-hash
    partitioning would let multiple oversized docs co-locate by chance."""
    import pyspark.sql.functions as F
    from pdf_extract_spark.operators.extract import salted_repartition

    # 400 small docs (~1 KB) + 96 oversized (~512 KB): heavy tail ~99% of
    # bytes; unique-url hashing must spread it near-uniformly
    rows = [(f"https://s.example/{i:06d}", None, bytearray(b"x" * 1024), None, "en")
            for i in range(400)]
    rows += [(f"https://big.example/{i:03d}", None,
              bytearray(b"y" * (512 * 1024)), None, "en") for i in range(96)]
    df = spark.createDataFrame(rows, pages.PAGES_SCHEMA)

    parts = (salted_repartition(df, 12)
             .select(F.spark_partition_id().alias("p"),
                     F.length("html").alias("n"))
             .groupBy("p").agg(F.sum("n").alias("part_bytes"))
             .collect())
    loads = [r["part_bytes"] for r in parts]
    total = sum(loads)
    assert len(loads) <= 12
    # uniform hash of 96 heavy keys over 12 partitions: mean 8/partition;
    # no partition may carry more than ~2.5× the mean byte load
    assert max(loads) < 0.21 * total, loads


def test_crash_between_data_and_lineage_writes(spark, tmp_path_factory):
    """Run-level commit protocol: lineage is the commit marker. A run whose
    lineage never landed (crash window) is treated as uncommitted — its
    data is dropped at resume and reprocessed exactly once, converging to
    the identical digest with no duplicates."""
    import shutil as sh

    base = str(tmp_path_factory.mktemp("crashwin"))
    df = spark.createDataFrame(pages.make_rows(120), schema=pages.PAGES_SCHEMA)
    run_extraction(spark, df, base, run_id="r1", num_partitions=3)
    d1 = final_digest(spark, base)

    sh.rmtree(f"{base}/lineage")  # crash happened before lineage commit

    stats = run_extraction(spark, df, base, run_id="r2", num_partitions=3)
    assert stats["n_in"] == 120  # uncommitted run dropped → full reprocess
    assert final_digest(spark, base) == d1
    ok = extracted_ok(spark, base)
    assert ok.count() == ok.select("url").distinct().count()
    shutil.rmtree(base, ignore_errors=True)


def test_crash_mid_write_torn_file(spark, tmp_path_factory):
    """Committer v2 exposes task files as tasks finish: a crash mid-write
    leaves a torn parquet file in the crashed run's directory. The resume
    cleanup must remove the whole uncommitted run (torn file included) and
    reprocess it — committed runs stay untouched."""
    import glob
    import os as _os

    base = str(tmp_path_factory.mktemp("torn"))
    df1 = spark.createDataFrame(pages.make_rows(80), schema=pages.PAGES_SCHEMA)
    run_extraction(spark, df1, base, run_id="r1", num_partitions=2)
    d1 = final_digest(spark, base)

    # simulate a crashed second run: partial dir with one torn file, no lineage
    crashed = f"{base}/extracted/run_id=crashed/status=ok"
    _os.makedirs(crashed)
    good = glob.glob(f"{base}/extracted/run_id=r1/status=ok/*.parquet")[0]
    with open(good, "rb") as f:
        torn = f.read()[:100]  # truncated parquet = unreadable
    with open(f"{crashed}/part-torn.parquet", "wb") as f:
        f.write(torn)

    full = spark.createDataFrame(pages.make_rows(130), schema=pages.PAGES_SCHEMA)
    stats = run_extraction(spark, full, base, run_id="r2", num_partitions=2)
    assert stats["n_in"] == 50  # only the genuinely new rows
    assert not _os.path.exists(f"{base}/extracted/run_id=crashed")
    ok = extracted_ok(spark, base)
    assert ok.count() == ok.select("url").distinct().count()
    assert ok.count() + quarantine(spark, base).count() == 130
    assert final_digest(spark, base) != d1  # grew by the new rows
    shutil.rmtree(base, ignore_errors=True)


def test_torn_lineage_removed_but_unreadable_aborts(spark, tmp_path_factory):
    """A lineage file without the parquet footer magic is a crashed lineage
    write → removed, run reprocessed. A lineage file that fails to read
    while LOOKING complete (footer intact) must ABORT the resume: deleting
    it would cascade into deleting the committed run's data."""
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = str(tmp_path_factory.mktemp("tornlin"))
    df = spark.createDataFrame(pages.make_rows(60), schema=pages.PAGES_SCHEMA)
    run_extraction(spark, df, base, run_id="r1", num_partitions=2)
    d1 = final_digest(spark, base)

    # torn lineage (crashed during its own write): footer magic missing
    lin = f"{base}/lineage"
    good = next(n for n in _os.listdir(lin) if n.endswith(".parquet"))
    with open(f"{lin}/{good}", "rb") as f:
        head = f.read()[:50]
    with open(f"{lin}/run-crashed.parquet", "wb") as f:
        f.write(head)
    stats = run_extraction(spark, df, base, run_id="r2", num_partitions=2)
    assert stats["n_in"] == 0  # r1 stayed committed; torn marker ignored
    assert not _os.path.exists(f"{lin}/run-crashed.parquet")
    assert final_digest(spark, base) == d1

    # complete-looking but unreadable (wrong schema would read fine, so use
    # a valid-footer file whose body is garbage): bytes end in PAR1 yet
    # pyarrow cannot parse the footer length/metadata
    bad = head + b"\x00" * 20 + b"PAR1"
    with open(f"{lin}/run-odd.parquet", "wb") as f:
        f.write(bad)
    with pytest.raises(RuntimeError, match="refusing to resume"):
        run_extraction(spark, df, base, run_id="r3", num_partitions=2)
    _os.remove(f"{lin}/run-odd.parquet")
    # data untouched by the aborted resume
    assert final_digest(spark, base) == d1
    shutil.rmtree(base, ignore_errors=True)


def test_lineage_marker_is_single_atomic_file(spark, tmp_path_factory):
    """The commit marker is ONE file per run (atomic rename), so a run can
    never be half-committed with under-reported audit counters."""
    import os as _os

    base = str(tmp_path_factory.mktemp("atomiclin"))
    df = spark.createDataFrame(pages.make_rows(90), schema=pages.PAGES_SCHEMA)
    run_extraction(spark, df, base, run_id="a b/1", num_partitions=3)
    files = [n for n in _os.listdir(f"{base}/lineage") if n.endswith(".parquet")]
    assert len(files) == 1
    # all partitions' audit rows live in that one file
    import pyarrow.parquet as pq
    tab = pq.read_table(f"{base}/lineage/{files[0]}")
    assert tab.num_rows == 3
    assert set(tab.column("run_id").to_pylist()) == {"a b/1"}
    assert sum(tab.column("n_in").to_pylist()) == 90
    # no temp droppings left behind
    assert not [n for n in _os.listdir(base) if n.startswith("_lineage_tmp")]
    shutil.rmtree(base, ignore_errors=True)


def test_charset_declared_pages_flow_through_extract(spark):
    """Charset-sniffing plumbing: declared-encoding payloads must decode
    through the distributed operator byte-identically to the kernel, and
    a lying declaration must land in quarantine as charset_mismatch."""
    import datetime as dt

    para = ("word " * 30).strip()
    doc = (lambda head: f"<html><head>{head}</head><body>"
           f"<article><p>{para} café résumé</p></article></body></html>")
    ts = dt.datetime(2026, 1, 1)
    rows = [
        ("cs://meta-cp1252", ts,
         doc('<meta charset="iso-8859-1">').encode("cp1252"), None, "en"),
        ("cs://bom-utf8", ts,
         b"\xef\xbb\xbf" + doc("").encode("utf-8"), None, "en"),
        ("cs://bom-utf16le", ts,
         b"\xff\xfe" + doc("").encode("utf-16-le"), None, "en"),
        ("cs://lying-decl", ts,
         doc('<meta charset="utf-8">').encode("cp1252"), None, "en"),
        ("cs://undeclared", ts, doc("").encode("cp1252"), None, "en"),
    ]
    df = spark.createDataFrame(rows, schema=pages.PAGES_SCHEMA)
    got = _collect_shas(extract_text(df, num_partitions=3))
    for url, _, payload, _, _ in rows:
        text, err = decode_payload(payload)
        assert got[url] == (text_sha256(text) if text is not None else None,
                            err), url
    assert got["cs://meta-cp1252"][1] is None
    assert got["cs://bom-utf16le"][1] is None
    assert got["cs://lying-decl"][1] == "charset_mismatch"
    assert got["cs://undeclared"][1] == "invalid_utf8"
    # the two BOM/meta decodes must agree with the plain-utf8 text
    plain, _ = decode_payload(doc("").encode("utf-8"))
    assert got["cs://bom-utf8"][0] == text_sha256(plain)
