"""CLI end-to-end (the launcher-equivalent surface)."""
from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pytest

from yamimageprocessor_tpu.cli import main
from yamimageprocessor_tpu.io import image_io


@pytest.fixture()
def workspace(tmp_path, rng, monkeypatch):
    monkeypatch.chdir(tmp_path)
    (tmp_path / "in").mkdir()
    for i in range(2):
        img = rng.integers(0, 220, (48, 64, 3), dtype=np.uint8)
        img[10:30, 20:50] = 230
        image_io.save_image(tmp_path / "in" / f"cell{i}.png", img)
    settings = tmp_path / "settings.json"
    return tmp_path, settings


def _configure(settings_path: Path, tmp_path: Path) -> None:
    assert main(["--settings", str(settings_path), "settings", "export",
                 str(tmp_path / "exported.json")]) == 0
    payload = json.loads((tmp_path / "exported.json").read_text())
    payload["preprocess/order"] = "NoiseReduction,BrightnessContrast"
    payload["segmentation/order"] = "Otsu"
    payload["extraction/order"] = "Histogram"
    (tmp_path / "exported.json").write_text(json.dumps(payload))
    assert main(["--settings", str(settings_path), "settings", "import",
                 str(tmp_path / "exported.json")]) == 0


def test_cli_process(workspace):
    tmp_path, settings = workspace
    _configure(settings, tmp_path)
    rc = main([
        "--settings", str(settings),
        "process", str(tmp_path / "in" / "cell0.png"), str(tmp_path / "out.png"),
        "--stages", "preprocessing,segmentation",
    ])
    assert rc == 0
    out = image_io.load_image(tmp_path / "out.png", lazy=False).to_array()
    assert set(np.unique(out)).issubset({0, 255})


def test_cli_batch_and_extract(workspace):
    tmp_path, settings = workspace
    _configure(settings, tmp_path)
    rc = main([
        "--settings", str(settings),
        "batch", str(tmp_path / "in"), str(tmp_path / "outdir"),
        "--stages", "preprocessing",
    ])
    assert rc == 0
    produced = sorted((tmp_path / "outdir").glob("*.png"))
    assert len(produced) == 2
    sidecars = sorted((tmp_path / "outdir").glob("*.png.json"))
    assert len(sidecars) == 2
    meta = json.loads(sidecars[0].read_text())
    assert meta["schema"] == "yam.image-metadata.v1"

    rc = main([
        "--settings", str(settings),
        "extract", str(tmp_path / "in" / "cell0.png"), str(tmp_path / "csv"),
    ])
    assert rc == 0
    # verbatim method filename, matching the reference's
    # ui/extraction.py:1858-1859 layout (method name as registered)
    assert (tmp_path / "csv" / "cell0_Histogram.csv").exists()


def test_cli_process_without_order_errors(workspace):
    tmp_path, settings = workspace
    rc = main([
        "--settings", str(settings),
        "process", str(tmp_path / "in" / "cell0.png"), str(tmp_path / "o.png"),
        "--stages", "segmentation",
    ])
    assert rc == 2


def test_cli_launch(workspace, capsys):
    """`yamtpu launch` bootstraps the selected stage panes and persists the
    selection (core/application_launcher.py entry semantics)."""
    tmp_path, settings = workspace
    rc = main(["--settings", str(settings), "launch",
               "--stages", "preprocessing,analysis"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "stage ready: preprocessing (PreprocessingPane)" in out
    assert "stage ready: analysis (ExtractionPane)" in out
    assert "segmentation" not in out
    # selection persisted: a bare launch honors it
    rc = main(["--settings", str(settings), "launch"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "stage ready: preprocessing" in out and "analysis" in out
    assert "segmentation" not in out


def test_cli_launch_unknown_stage(workspace, capsys):
    tmp_path, settings = workspace
    import pytest

    with pytest.raises(SystemExit) as exc:
        main(["--settings", str(settings), "launch", "--stages", "nope"])
    assert "unknown stage 'nope'" in str(exc.value)
