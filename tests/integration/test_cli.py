"""CLI integration: compress → decompress → eval round trip via the argparse
entry points (SURVEY.md C25), tiny preset, temp workdir."""

import json
import sys

import numpy as np
import pytest
from PIL import Image

from tpucdc.cli.main import main


@pytest.fixture(scope="module")
def png(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli") / "img.png"
    rng = np.random.default_rng(0)
    img = np.repeat(np.repeat(
        rng.integers(0, 255, (16, 16, 3), dtype=np.uint8), 8, 0), 8, 1)
    Image.fromarray(img[:120, :112]).save(p)   # odd size exercises padding
    return p


def test_cli_compress_decompress(png, tmp_path, capsys):
    blob = tmp_path / "img.tpucdc"
    out = tmp_path / "out.png"
    main(["compress", str(png), str(blob), "--preset", "tiny"])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["bytes"] > 0 and stats["bpp"] > 0
    assert blob.exists()

    main(["decompress", str(blob), str(out), "--preset", "tiny",
          "--steps", "2"])
    shape = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert shape["shape"] == [120, 112, 3]
    assert Image.open(out).size == (112, 120)


def test_cli_batch_compress_decompress(png, tmp_path, capsys):
    """Multi-input verbs: OUTPUT becomes a directory; compress uses the
    pipelined batch encoder, decompress the FIFO-pipelined decoder."""
    rng = np.random.default_rng(1)
    png2 = tmp_path / "img2.png"
    Image.fromarray(rng.integers(0, 255, (120, 112, 3),
                                 dtype=np.uint8)).save(png2)
    bdir = tmp_path / "blobs"
    main(["compress", str(png), str(png2), str(bdir), "--preset", "tiny"])
    rows = [json.loads(ln)
            for ln in capsys.readouterr().out.strip().splitlines()[-2:]]
    assert all(r["bytes"] > 0 and "file" in r for r in rows)
    blobs = sorted(bdir.glob("*.tpucdc"))
    assert len(blobs) == 2

    odir = tmp_path / "outs"
    main(["decompress", *map(str, blobs), str(odir), "--preset", "tiny",
          "--steps", "2"])
    rows = [json.loads(ln)
            for ln in capsys.readouterr().out.strip().splitlines()[-2:]]
    assert all(r["shape"] == [120, 112, 3] for r in rows)
    assert len(sorted(odir.glob("*.png"))) == 2


def test_cli_single_input_directory_output(png, tmp_path, capsys):
    """`compress blobs/*.png outdir/` with a one-file glob must still take
    the directory-output path (code-review r4: keying batch mode on input
    COUNT crashed this), and same-stem inputs must not overwrite."""
    bdir = tmp_path / "blobs"
    main(["compress", str(png), str(bdir) + "/", "--preset", "tiny"])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["file"].endswith(".tpucdc") and (bdir / "img.tpucdc").exists()

    # same stem from two directories → disambiguated, not overwritten
    d2 = tmp_path / "other"
    d2.mkdir()
    png2 = d2 / "img.png"
    Image.open(png).save(png2)
    main(["compress", str(png), str(png2), str(bdir), "--preset", "tiny"])
    capsys.readouterr()
    names = sorted(p.name for p in bdir.glob("*.tpucdc"))
    assert names == ["img.tpucdc", "img_2.tpucdc"]

    odir = tmp_path / "outs"
    main(["decompress", str(bdir / "img.tpucdc"), str(odir) + "/",
          "--preset", "tiny", "--steps", "2"])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["shape"] == [120, 112, 3] and (odir / "img.png").exists()


def test_cli_train_smoke(tmp_path, capsys):
    main(["train", "--preset", "tiny", "--steps", "1",
          "--workdir", str(tmp_path),
          "--set", "train.batch_size=8", "--set", "train.crop_size=64",
          "--set", "train.log_every=1"])
    # λ-tagged run dir with logs written (SURVEY.md §5.4).
    tag = next(tmp_path.glob("lambda*"))
    assert (tag / "logs" / "metrics.jsonl").exists()


def test_cli_rejects_bad_preset(png, tmp_path):
    with pytest.raises(SystemExit):
        main(["compress", str(png), str(tmp_path / "x"), "--preset", "nope"])


def test_cli_optimize_gamma_spatial(png, tmp_path, capsys):
    """--optimize-gamma spatial emits a decodable stream and echoes the
    dial (scalar fallback γ always; grid dims when the fit won)."""
    blob = tmp_path / "sp.tpucdc"
    main(["compress", str(png), str(blob), "--preset", "tiny",
          "--optimize-gamma", "spatial"])
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["gamma"] is not None
    if "gamma_grid" in row:
        assert row["gamma_grid"] == [1, 1]    # 120×112 pads to one tile
    out = tmp_path / "sp.png"
    main(["decompress", str(blob), str(out), "--preset", "tiny",
          "--steps", "2"])
    shape = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert shape["shape"] == [120, 112, 3]


def test_cli_optimize_gamma_rejects_bad_value(png, tmp_path):
    with pytest.raises(SystemExit, match="spatial"):
        main(["compress", str(png), str(tmp_path / "x.tpucdc"),
              "--preset", "tiny", "--optimize-gamma", "bogus"])
