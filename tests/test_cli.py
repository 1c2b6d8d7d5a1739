"""CLI surface: list is Spark-free; run/explain resolve catalog names."""


def test_cli_list(capsys):
    from fhc_rco_etl_scalable_spark.__main__ import main

    assert main(["list", "--filter", "winnow"]) == 0
    out = capsys.readouterr().out
    assert "winnow_fingerprints  [oracle]" in out
    assert "winnow_near_dups  [oracle]" in out


def test_cli_unknown_query(capsys):
    from fhc_rco_etl_scalable_spark.__main__ import main

    # name validation happens BEFORE session construction — instant error
    assert main(["explain", "no_such_query"]) == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_state_inspect(spark, tmp_path, capsys):
    """`state` lists operator metadata and dumps a store's typed rows
    from a checkpoint (exercises streaming/state_inspect through the
    CLI wiring; the session is reused via get_spark's singleton)."""
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    spark.createDataFrame([("a", 1), ("b", 2), ("a", 3)], "k string, v int")\
        .coalesce(1).write.mode("overwrite").parquet(src)
    q = (
        spark.readStream.schema("k string, v int").parquet(src)
        .groupBy("k").count()
        .writeStream.format("memory").queryName("cli_state_t")
        .outputMode("complete").option("checkpointLocation", chk)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    q.stop()

    from fhc_rco_etl_scalable_spark.__main__ import main

    assert main(["state", chk]) == 0
    out = capsys.readouterr().out
    assert "stateStoreSave" in out
    assert main(["state", chk, "--operator", "0", "-n", "5"]) == 0
    out = capsys.readouterr().out
    assert "partition_id" in out
