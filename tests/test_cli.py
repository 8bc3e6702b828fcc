"""The spark-submit CLI surface (cli.py): build → query → delete round
trip over a temp physical index, mirroring the reference's command verbs
(Command.scala:30-56: init/update/delete + the query servlet)."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

from easy_solr4files_index_spark import cli


@pytest.fixture(scope="module")
def index_dir(spark):
    with tempfile.TemporaryDirectory(prefix="cli_idx_") as d:
        rc = cli.main(["build", "--input", "/root/testdata/sf0.001",
                       "--index", d, "--lineage-groups", "1"])
        assert rc == 0
        yield d


def test_cli_build_then_query(index_dir, capsys, spark):
    rc = cli.main(["query", "--index", index_dir, "--text", "spark join", "--k", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["summary"]["returned"] == 3
    assert all(set(fi) == {"repo", "path", "lang", "score"} for fi in out["fileitems"])
    scores = [fi["score"] for fi in out["fileitems"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_query_matchall_filtered(index_dir, capsys, spark):
    rc = cli.main(["query", "--index", index_dir, "--filters", '{"lang": ["de"]}'])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["summary"]["text"] == "*"
    assert out["summary"]["returned"] > 0


def test_cli_build_resume_skips_done(index_dir, capsys, spark):
    rc = cli.main(["build", "--input", "/root/testdata/sf0.001",
                   "--index", index_dir, "--lineage-groups", "1"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["stages_run"] == []           # identical fingerprint ⇒ all resumed
    assert "docs_store" in out["stages_skipped"]


def test_cli_delete_is_durable(capsys, spark):
    """`fts delete` must change what `fts query` returns afterwards —
    the on-disk index is updated, not a dry-run preview."""
    with tempfile.TemporaryDirectory(prefix="cli_del_") as d:
        assert cli.main(["build", "--input", "/root/testdata/sf0.001",
                         "--index", d, "--lineage-groups", "1"]) == 0
        capsys.readouterr()
        assert cli.main(["query", "--index", d, "--filters",
                         '{"repo": ["src0"]}', "--k", "100"]) == 0
        before = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert before["summary"]["returned"] > 0

        assert cli.main(["delete", "--index", d, "--repo", "src0"]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["n_docs_after"] > 0 and out["tombstone_ranges"] >= 1

        assert cli.main(["query", "--index", d, "--filters",
                         '{"repo": ["src0"]}', "--k", "100"]) == 0
        after = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert after["summary"]["returned"] == 0

        assert cli.main(["compact", "--index", d]) == 0
        cout = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert cout["tombstone_ranges"] == 0


@pytest.mark.skipif(shutil.which("spark-submit") is None
                    and not os.path.exists("/opt/spark/bin/spark-submit"),
                    reason="no spark-submit on PATH")
def test_spark_submit_pyfiles_smoke(tmp_path):
    """The north-rule launch mode, end-to-end: package the engine as a
    --py-files zip, spark-submit the build and a query from a cwd with NO
    repo checkout (imports must resolve from the zip), and check the
    envelope. Separate cold JVMs per verb — exactly how a cluster
    submission runs; the in-process fixtures above cover the verbs'
    semantics, this covers the packaging/launch path itself."""
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = tmp_path / "pkg.zip"
    subprocess.run([sys.executable, "-m", "zipfile", "-c", str(zip_path),
                    "easy_solr4files_index_spark"], cwd=repo, check=True)
    shutil.copy(os.path.join(repo, "submit.py"), tmp_path / "submit.py")
    base = [spark_submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path), str(tmp_path / "submit.py")]
    idx = str(tmp_path / "idx")

    out = subprocess.run(base + ["build", "--input", "/root/testdata/sf0.001",
                                 "--index", idx, "--lineage-groups", "1"],
                         cwd=tmp_path, capture_output=True, text=True,
                         check=True, timeout=420)
    built = json.loads(out.stdout.strip().splitlines()[-1])
    assert built["n_docs"] == 500 and not built["stages_skipped"]

    out = subprocess.run(base + ["query", "--index", idx,
                                 "--text", "spark join", "--k", "5"],
                         cwd=tmp_path, capture_output=True, text=True,
                         check=True, timeout=420)
    env = json.loads(out.stdout.strip().splitlines()[-1])
    assert env["summary"]["returned"] == 5
    assert env["summary"]["found"] >= 5
    scores = [fi["score"] for fi in env["fileitems"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_build_from_catalog_table(capsys, spark, tmp_path):
    """--input accepts a catalog table identifier (`spark.read.table`) —
    the DataSource-V2 path an Iceberg `cat.db.docs` table takes when the
    runtime carries the Iceberg jars (this container has none, so the
    built-in catalog's parquet provider proves the same branch)."""
    from easy_solr4files_index_spark.sources.docs_source import load_docs

    load_docs(spark, "/root/testdata/sf0.001").limit(120).write \
        .mode("overwrite").saveAsTable("docs_tbl_r4")
    try:
        d = str(tmp_path / "idx_tbl")
        rc = cli.main(["build", "--input", "docs_tbl_r4",
                       "--index", d, "--lineage-groups", "1"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["n_docs"] == 120
        rc = cli.main(["query", "--index", d, "--text", "spark join", "--k", "2"])
        assert rc == 0
        env = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert env["summary"]["returned"] == 2
    finally:
        spark.sql("DROP TABLE IF EXISTS docs_tbl_r4")


def test_cli_curate_writes_curated_corpus(capsys, spark, tmp_path):
    """`fts curate` writes the curated parquet and reports the drop;
    exact dedup + a bench screen both bite on a crafted corpus."""
    src = str(tmp_path / "raw")
    spark.createDataFrame(
        [(1, "alpha bravo charlie delta echo foxtrot golf hotel"),
         (2, "alpha bravo charlie delta echo foxtrot golf hotel"),  # dup of 1
         (3, "completely different words live here today friends"),
         (4, "leak alpha bravo charlie delta echo inside this doc")],
        "doc_id long, text string").write.parquet(src)
    bench = str(tmp_path / "bench")
    spark.createDataFrame([(100, "alpha bravo charlie delta echo")],
                          "bench_id long, text string").write.parquet(bench)
    out_dir = str(tmp_path / "curated")
    rc = cli.main(["curate", "--input", src, "--output", out_dir,
                   "--min-tokens", "3", "--bench", bench,
                   "--contamination-threshold", "0.9"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # doc 2 (exact dup), docs 1+4 (contain the full bench item) drop
    assert rep["n_in"] == 4 and rep["n_kept"] == 1 and rep["n_dropped"] == 3
    kept = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert kept == {3}


def test_cli_spans_stats_and_strip(capsys, spark, tmp_path):
    """`fts spans` stats mode flags the shared-boilerplate docs; strip
    mode removes the span; the span gate drops them from curate."""
    src = str(tmp_path / "raw_sp")
    boiler = ("shared boilerplate one two three four five six seven "
              "eight nine ten eleven twelve")
    spark.createDataFrame(
        [(1, "unique words aaa bbb ccc ddd eee fff " + boiler),
         (2, "other body ggg hhh iii jjj kkk lll " + boiler),
         (3, "completely clean document with only original words here")],
        "doc_id long, text string").write.parquet(src)

    out = str(tmp_path / "sp_stats")
    rc = cli.main(["spans", "--input", src, "--output", out, "--w", "8"])
    assert rc == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["docs_flagged"] == 2 and rep["dup_tokens"] > 0

    out2 = str(tmp_path / "sp_strip")
    rc = cli.main(["spans", "--input", src, "--output", out2, "--w", "8",
                   "--strip"])
    assert rc == 0
    rows = {r["doc_id"]: r["clean_text"]
            for r in spark.read.parquet(out2).collect()}
    assert "boilerplate" not in rows[1] and "boilerplate" not in rows[2]
    assert "unique" in rows[1] and rows[3].startswith("completely")

    out3 = str(tmp_path / "sp_curated")
    rc = cli.main(["curate", "--input", src, "--output", out3,
                   "--max-dup-span-fraction", "0.3", "--span-w", "8"])
    assert rc == 0
    rep3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep3["n_kept"] == 1  # only the clean doc survives the gate
