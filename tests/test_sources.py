"""Input-source abstraction (sources.py): parquet path works, the
iceberg branch is gated with an actionable error when the runtime jar
is absent (this sandbox), and snapshot options are iceberg-only."""

import pytest

from indexer_spark.sources import read_source


def test_parquet_roundtrip(spark, tmp_path):
    p = str(tmp_path / "src")
    spark.range(10).write.parquet(p)
    assert read_source(spark, p, "parquet").count() == 10


def test_snapshot_requires_iceberg(spark, tmp_path):
    p = str(tmp_path / "src2")
    spark.range(1).write.parquet(p)
    with pytest.raises(ValueError, match="iceberg"):
        read_source(spark, p, "parquet", snapshot_id=3)


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unknown source format"):
        read_source(spark, "/nonexistent", "orc")


def test_iceberg_gated_without_runtime_jar(spark):
    from indexer_spark.sources import _has_iceberg

    if _has_iceberg(spark):
        pytest.skip("iceberg runtime present; gate not exercised")
    with pytest.raises(RuntimeError, match="Iceberg runtime jar"):
        read_source(spark, "catalog.db.transcripts", "iceberg")


def test_iceberg_branch_with_mocked_catalog(monkeypatch):
    """Execute the iceberg read branch against a recording fake session:
    the sandbox ships no runtime jar, so this covers the snapshot-option
    plumbing (format name, snapshot-id / as-of-timestamp options, catalog
    table load) that a real cluster session would exercise."""
    from indexer_spark import sources

    class FakeReader:
        def __init__(self):
            self.fmt, self.opts, self.loaded = None, {}, None

        def format(self, f):
            self.fmt = f
            return self

        def option(self, k, v):
            self.opts[k] = v
            return self

        def load(self, loc):
            self.loaded = loc
            return ("df", loc)

    class FakeSpark:
        def __init__(self):
            self.reader = FakeReader()

        @property
        def read(self):
            return self.reader

    monkeypatch.setattr(sources, "_has_iceberg", lambda spark: True)

    fake = FakeSpark()
    out = sources.read_source(fake, "cat.db.transcripts", "iceberg",
                              snapshot_id=1234)
    assert out == ("df", "cat.db.transcripts")
    assert fake.reader.fmt == "iceberg"
    assert fake.reader.opts == {"snapshot-id": "1234"}

    fake2 = FakeSpark()
    sources.read_source(fake2, "cat.db.t2", "iceberg",
                        as_of_timestamp=1700000000000)
    assert fake2.reader.opts == {"as-of-timestamp": "1700000000000"}
    fake3 = FakeSpark()
    sources.read_source(fake3, "cat.db.t3", "iceberg")
    assert fake3.reader.opts == {}


def test_csv_transcripts(spark, tmp_path):
    """CSV -> transcripts shape: one row per turn, text = space-joined
    fields (reference parsers.rs CSV join), dense per-file turn_idx, and
    an end-to-end build+query over the result."""
    import os

    from indexer_spark.build import BuildConfig, build_index
    from indexer_spark.query import IndexReader
    from indexer_spark.sources import read_csv_transcripts

    src = tmp_path / "csvs"
    os.makedirs(src)
    (src / "a.csv").write_text(
        "title,body\nhello,world of spark\nsecond,row here\n"
    )
    (src / "b.csv").write_text("title,body\nzebra,quantum jazz\n")
    df = read_csv_transcripts(spark, str(src))
    rows = df.orderBy("conv_id", "turn_idx").collect()
    assert [r["turn_idx"] for r in rows] == [0, 1, 0]
    assert rows[0]["text"] == "hello world of spark"
    assert rows[2]["text"] == "zebra quantum jazz"
    assert df.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    d = str(tmp_path / "csvidx")
    build_index(spark, df, d, BuildConfig(block_size=32, id_partitions=2))
    reader = IndexReader(spark, d)
    hits = reader.search("zebra", 5)
    assert len(hits) == 1
    res = reader.resolve(hits).collect()[0]
    assert res["conv_id"].endswith("b.csv")


def test_cli_query_output_file(spark, tmp_path):
    """--output writes the same JSON the CLI prints (reference --output
    sink, main.rs:200-212)."""
    import json

    from indexer_spark.build import BuildConfig, build_index
    from indexer_spark.cli import main
    from indexer_spark.synth import gen_transcripts

    pdf = gen_transcripts(100, seed=3)
    d = str(tmp_path / "cliidx")
    build_index(spark, spark.createDataFrame(pdf), d,
                BuildConfig(block_size=32, id_partitions=2))
    q = pdf["text"].iloc[0].split()[0]
    out = str(tmp_path / "result.json")
    main(["query", "--index", d, "--query", q, "--k", "3",
          "--output", out])
    data = json.loads(open(out).read())
    assert data["query"] == q and len(data["hits"]) >= 1
    assert {"conv_id", "turn_idx", "doc_id", "score"} <= set(data["hits"][0])


def test_cli_compact_and_bool_query(spark, tmp_path, capsys):
    """CLI surface for round-5 ops: `compact --index --out` produces a
    queryable index; `query --mode bool` serves the boolean language."""
    import json

    from indexer_spark.build import BuildConfig, build_index
    from indexer_spark.cli import main
    from indexer_spark.synth import gen_transcripts

    pdf = gen_transcripts(120, seed=5)
    d = str(tmp_path / "cmpidx")
    build_index(spark, spark.createDataFrame(pdf), d,
                BuildConfig(block_size=32, id_partitions=4))
    out_dir = str(tmp_path / "cmpout")
    main(["compact", "--index", d, "--out", out_dir, "--shard-docs", "4096"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["ok"] and res["n_shards"] == 1
    w = pdf["text"].iloc[0].split()
    main(["query", "--index", out_dir,
          "--query", f"{w[0]} NOT {w[1]}", "--mode", "bool", "--k", "3"])
    data = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "hits" in data
