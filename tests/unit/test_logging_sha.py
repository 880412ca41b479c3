"""code_sha stamping (VERDICT r3 item 10): every eval row carries the git
SHA of the code that produced it, and the table renderer refuses to mix
rows from different code states — the guard that would have caught the r3
λ=128 stale-metric contamination."""

import importlib.util
import json
import pathlib
import sys

import pytest

from tpucdc.utils.logging import MetricLogger, code_sha

_SCRIPTS = pathlib.Path(__file__).resolve().parents[2] / "scripts"


def _load_tables_mod():
    spec = importlib.util.spec_from_file_location(
        "make_baseline_tables", _SCRIPTS / "make_baseline_tables.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_write_row_stamps_code_sha(tmp_path):
    logger = MetricLogger(tmp_path / "m", use_clu=False, echo=False)
    logger.write_row({"psnr": 30.0})
    logger.write_row({"psnr": 31.0, "code_sha": "deadbee"})  # caller wins
    logger.close()
    rows = [json.loads(l) for l in
            (tmp_path / "m" / "metrics.jsonl").read_text().splitlines()]
    assert rows[0]["code_sha"] == code_sha()
    assert rows[0]["code_sha"] not in ("", None)
    assert rows[1]["code_sha"] == "deadbee"


def test_scalar_call_stamps_code_sha(tmp_path):
    logger = MetricLogger(tmp_path / "m", use_clu=False, echo=False)
    logger(5, {"loss": 1.0})
    logger.close()
    row = json.loads((tmp_path / "m" / "metrics.jsonl").read_text())
    assert row["code_sha"] == code_sha()


def test_lambda_and_sha_filters(tmp_path, capsys, monkeypatch):
    """r4: --lambdas/--sha pre-filter BEFORE the mixed-SHA check, so a
    queue-appended multi-λ JSONL renders per-λ without the override env."""
    mod = _load_tables_mod()
    monkeypatch.delenv("TPUCDC_ALLOW_MIXED_SHA", raising=False)
    p = tmp_path / "rows.jsonl"
    rows = [{"code_sha": "aaa", "lambda": 32, "mode": "mean", "psnr": 30.0,
             "aggregate": True, "bpp": 0.1},
            {"code_sha": "bbb", "lambda": 128, "mode": "mean", "psnr": 28.0,
             "aggregate": True, "bpp": 0.3}]
    p.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    with pytest.raises(SystemExit, match="different code states"):
        mod.main([str(p)])
    mod.main([str(p)], lambdas={32.0})
    out = capsys.readouterr().out
    assert "| 32 |" in out and "| 128 |" not in out
    mod.main([str(p)], sha="bbb")
    assert "| 128 |" in capsys.readouterr().out
    with pytest.raises(SystemExit, match="no rows"):
        mod.main([str(p)], sha="zzz")


def test_renderer_refuses_mixed_shas(monkeypatch):
    mod = _load_tables_mod()
    monkeypatch.delenv("TPUCDC_ALLOW_MIXED_SHA", raising=False)
    mixed = [{"code_sha": "aaa", "psnr": 1.0},
             {"code_sha": "bbb", "psnr": 2.0}]
    with pytest.raises(SystemExit, match="different code states"):
        mod.check_single_sha(mixed)
    # single SHA + unstamped legacy rows: warning only, no refusal
    mod.check_single_sha([{"code_sha": "aaa"}, {"psnr": 3.0}])
    # explicit override allowed
    monkeypatch.setenv("TPUCDC_ALLOW_MIXED_SHA", "1")
    mod.check_single_sha(mixed)
