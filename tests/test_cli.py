"""The spark-submit CLI surface (cli.py): build → query → delete round
trip over a temp physical index, mirroring the reference's command verbs
(Command.scala:30-56: init/update/delete + the query servlet)."""

import json
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
