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
