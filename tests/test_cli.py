"""The CLI app shell (cli.py) — the reference's user surface replicated:
render-to-file, the initScene2 stdin menu (type letter + board coordinate,
duplicate coordinates overwrite, yes/no continue loop), and the fit
workload.  Runs tiny configurations on CPU.
"""
import io
import json
import os

import numpy as np
import pytest

from ray_tracer_fragment_shader_tpu.cli import main
from ray_tracer_fragment_shader_tpu.io.image import read_ppm


def test_render_preset_writes_image(tmp_path, capsys):
    out = tmp_path / "demo.ppm"
    main(["render", "--preset", "single_sphere", "--size", "32",
          "--out", str(out)])
    assert out.exists()
    img = read_ppm(str(out))
    assert img.shape == (32, 32, 3)
    assert img.max() > 0  # the sphere is lit
    assert "rendered 32x32" in capsys.readouterr().out


def test_interactive_menu_semantics(tmp_path, monkeypatch, capsys):
    """Menu session: invalid type retries, invalid coordinate rejected,
    duplicate coordinate overwrites (map<string,int>,
    MySdlApplication.cpp:1450-1490), y/n accepted."""
    out = tmp_path / "scene.ppm"
    feed = "\n".join([
        "z",          # invalid type -> menu repeats
        "d", "q9",    # invalid coordinate -> rejected
        "d", "b4",    # sphere at b4
        "y",
        "c", "b4",    # cube OVERWRITES b4 (dedupe by coordinate)
        "yes",
        "a", "b6",    # light
        "no",
    ]) + "\n"
    monkeypatch.setattr("sys.stdin", io.StringIO(feed))
    main(["interactive", "--size", "32", "--depth", "1",
          "--out", str(out)])
    assert out.exists()
    text = capsys.readouterr().out
    assert "invalid coordinate 'q9'" in text
    # b4 holds the CUBE (the later entry), not the sphere
    assert "'b4': 'cube'" in text
    assert "'b6': 'light'" in text
    assert read_ppm(str(out)).shape == (32, 32, 3)


def test_fit_single_view_descends(tmp_path, capsys):
    out_dir = tmp_path / "fit"
    main(["fit", "--size", "32", "--steps", "20", "--lr", "0.2",
          "--seed", "1", "--out-dir", str(out_dir), "--out", "unused.png"])
    hist = json.load(open(out_dir / "history.json"))
    assert len(hist) == 20
    assert np.isfinite(hist).all()
    # Adam's first steps can overshoot at this scale; the fit must still
    # find a better point than the perturbed init within 20 steps
    assert min(hist) < hist[0]
    assert (out_dir / "target.png").exists()
    assert (out_dir / "fitted.png").exists()
    assert (out_dir / "params.npz").exists()


def test_render_watch_progressive(tmp_path, capsys):
    """--watch renders 1/8 -> full resolution, rewriting the same file each
    pass (the reference's live-repaint experience, deviation D6); the final
    file is full resolution."""
    out = tmp_path / "w.ppm"
    main(["render", "--preset", "single_sphere", "--size", "64",
          "--out", str(out), "--watch"])
    img = read_ppm(str(out))
    assert img.shape == (64, 64, 3)
    text = capsys.readouterr().out
    assert "rendered 16x16" in text and "rendered 32x32" in text
    assert "rendered 64x64" in text
