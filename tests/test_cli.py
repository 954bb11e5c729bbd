"""CLI driver smoke tests (the reference's per-algorithm test binaries,
`tests/*/test_*.cu`, as one entry point)."""

import os

import pytest

from mini_tpu.cli import main

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "test_bfs.mtx")


@pytest.mark.parametrize(
    "argv",
    [
        ["bfs", "--file", FIXTURE, "--undirected", "--src", "0",
         "--validate"],
        ["sssp", "--file", FIXTURE, "--undirected", "--src", "0",
         "--validate"],
        ["pr", "--file", FIXTURE, "--undirected", "--validate"],
        ["coloring", "--file", FIXTURE, "--undirected", "--validate"],
        ["kcore", "--file", FIXTURE, "--undirected", "--validate"],
        ["lspar", "--file", FIXTURE, "--undirected"],
    ],
)
def test_cli_runs_and_validates(argv, capsys):
    assert main(argv) == 0
    out = capsys.readouterr().out
    if "--validate" in argv:
        assert "Correct." in out


FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.parametrize(
    "argv",
    [
        # each reference test dir's fixture through the matching driver,
        # mirroring the reference run.sh invocations (tests/*/run.sh)
        ["coloring", "--file", os.path.join(FIXDIR, "test_coloring.mtx"),
         "--undirected", "--seed", "31", "--validate"],
        ["pr", "--file", os.path.join(FIXDIR, "test_coloring.mtx"),
         "--undirected", "--validate"],
        ["lspar", "--file", os.path.join(FIXDIR, "test_coloring.mtx"),
         "--undirected"],
        ["sssp", "--file", os.path.join(FIXDIR, "test_sssp.mtx"),
         "--undirected", "--src", "0", "--validate"],
        ["kcore", "--file", os.path.join(FIXDIR, "test_kcore.mtx"),
         "--undirected", "--validate"],
        ["gcn", "--file", os.path.join(FIXDIR, "test_kcore.mtx"),
         "--undirected", "--validate"],
    ],
)
def test_cli_reference_fixtures(argv, capsys):
    assert main(argv) == 0
    out = capsys.readouterr().out
    if "--validate" in argv:
        assert "Correct." in out


def test_cli_rmat(capsys):
    assert main(["bfs", "--rmat-scale", "8", "--src", "0", "--validate"]) == 0
    assert "Correct." in capsys.readouterr().out


def test_cli_cc(capsys):
    assert main(["cc", "--file", FIXTURE, "--undirected", "--validate"]) == 0
    assert "Correct." in capsys.readouterr().out


def test_cli_batched_sources(capsys):
    assert main(["bfs", "--file", FIXTURE, "--undirected",
                 "--sources", "0,2,5", "--validate"]) == 0
    assert "Correct." in capsys.readouterr().out
    assert main(["sssp", "--file", FIXTURE, "--undirected",
                 "--sources", "0,3", "--validate"]) == 0
    assert "Correct." in capsys.readouterr().out


@pytest.mark.parametrize("algo", ["gat", "sage"])
def test_cli_gnn_drivers(algo, capsys):
    assert main([algo, "--rmat-scale", "8", "--validate"]) == 0
    assert "Correct." in capsys.readouterr().out
