"""Tests for the trade-off figure CLI (vae_song_tpu/cli/figures.py) —
the equivalent of the reference's draw_figure/draw.py, driven by a tiny
synthetic exp_lip sweep CSV."""

import math
import os

import pytest

from vae_song_tpu.cli import figures


CSV_HEADER = "alpha,beta,kl,L(z)\n"


def _write_sweep(path, rows):
    with open(path, "w") as fh:
        fh.write(CSV_HEADER)
        for r in rows:
            fh.write(",".join(str(v) for v in r) + "\n")


@pytest.fixture
def sweep_dir(tmp_path):
    # Two alphas x two betas, two seeds per cell; one junk + one inf row.
    rows = [
        (0.0, 0.1, 5.0, 100.0),
        (0.0, 0.1, 4.0, 200.0),   # kl_min pick for (0.0, 0.1)
        (0.0, 1.0, 2.0, 50.0),
        (0.0, 1.0, 3.0, 10.0),    # lipschitz_min pick for (0.0, 1.0)
        (0.1, 0.1, 90.0, 6.0),
        (0.1, 0.1, 80.0, 7.0),
        (0.1, 1.0, 60.0, 3.0),
        (0.1, 1.0, 70.0, 2.0),
        (0.1, 1.0, float("inf"), 1.0),  # dropped: non-finite
    ]
    _write_sweep(tmp_path / "exp_lip_toyA.csv", rows)
    _write_sweep(tmp_path / "exp_lip_toyB.csv", rows[:4])
    # Distractors the discovery must ignore.
    (tmp_path / "notes.csv").write_text(CSV_HEADER)
    (tmp_path / "exp_lip_bad.txt").write_text("not a csv")
    return tmp_path


def test_discover_sweeps_tags_and_filtering(sweep_dir):
    sweeps = figures.discover_sweeps(sweep_dir)
    assert sorted(sweeps) == ["toyA", "toyB"]
    assert sweeps["toyA"].name == "exp_lip_toyA.csv"


def test_read_sweep_drops_nonfinite_and_junk(sweep_dir, tmp_path):
    pts = figures.read_sweep(sweep_dir / "exp_lip_toyA.csv")
    assert len(pts) == 8  # inf row dropped
    assert all(p.finite() for p in pts)
    # Malformed rows are skipped, not fatal.
    bad = tmp_path / "exp_lip_mangled.csv"
    bad.write_text(CSV_HEADER + "0.1,0.1,oops,1.0\n0.2,0.2,1.0,2.0\n")
    pts = figures.read_sweep(bad)
    assert [(p.alpha, p.beta) for p in pts] == [(0.2, 0.2)]


def test_pick_representatives_criteria(sweep_dir):
    pts = figures.read_sweep(sweep_dir / "exp_lip_toyA.csv")

    by_kl = {(p.alpha, p.beta): p for p in figures.pick_representatives(pts, "kl_min")}
    assert len(by_kl) == 4
    assert by_kl[(0.0, 0.1)].kl == 4.0
    assert by_kl[(0.1, 1.0)].kl == 60.0

    by_lz = {(p.alpha, p.beta): p
             for p in figures.pick_representatives(pts, "lipschitz_min")}
    assert by_lz[(0.0, 1.0)].lz == 10.0
    assert by_lz[(0.1, 1.0)].lz == 2.0

    by_kl_max = {(p.alpha, p.beta): p
                 for p in figures.pick_representatives(pts, "kl_max")}
    assert by_kl_max[(0.0, 0.1)].kl == 5.0

    with pytest.raises(ValueError):
        figures.pick_representatives(pts, "elbo_min")


def test_pick_representatives_tie_keeps_first():
    pts = [
        figures.SweepPoint(0.0, 0.1, kl=1.0, lz=111.0),
        figures.SweepPoint(0.0, 0.1, kl=1.0, lz=222.0),
    ]
    (rep,) = figures.pick_representatives(pts, "kl_min")
    assert rep.lz == 111.0


def test_build_figures_writes_contract_svg(sweep_dir, tmp_path):
    out_dir = tmp_path / "figs"
    written = figures.build_figures(sweep_dir, out_dir)
    assert sorted(os.path.basename(p) for p in written) == [
        "toyA_plot.svg", "toyB_plot.svg",
    ]
    svg = (out_dir / "toyA_plot.svg").read_text()
    # Figure contract: two log-scale panels, beta-VAE baseline labeled.
    assert "KL Divergence with" in svg
    assert "Local bi-Lipschitz with" in svg
    assert "-VAE)" in svg and "(Ours)" in svg


def test_build_figures_only_tag_and_empty_dir(sweep_dir, tmp_path, capsys):
    out_dir = tmp_path / "figs"
    written = figures.build_figures(sweep_dir, out_dir, only="toyB")
    assert [os.path.basename(p) for p in written] == ["toyB_plot.svg"]

    assert figures.build_figures(sweep_dir, out_dir, only="missing") == []
    empty = tmp_path / "empty"
    empty.mkdir()
    assert figures.build_figures(empty, out_dir) == []
    out = capsys.readouterr().out
    assert "not among" in out and "no exp_lip_" in out


def test_main_cli_end_to_end(sweep_dir, tmp_path):
    out_dir = tmp_path / "cli_out"
    figures.main([
        "--input_dir", str(sweep_dir),
        "--output_dir", str(out_dir),
        "--selection_method", "lipschitz_min",
        "--experiment", "toyA",
    ])
    assert (out_dir / "toyA_plot.svg").exists()
    assert not (out_dir / "toyB_plot.svg").exists()
