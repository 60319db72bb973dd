"""Small utilities: dashboard report, metric logger, step timer, config CLI."""

import json

import numpy as np

from miseg_tpu.config import Config, build_parser


def test_dashboard_report(tmp_path):
    from miseg_tpu.cli.dashboard import study_report
    from miseg_tpu.hpo import create_study
    storage = str(tmp_path / "j.jsonl")
    study = create_study(storage=storage)
    study.optimize(lambda t: t.suggest_float("x", 0, 1), n_trials=3)
    rep = study_report(storage)
    assert rep["n_trials"] == 3
    assert rep["best"] is not None
    assert all(t["state"] == "complete" for t in rep["trials"])


def test_metric_logger_jsonl(tmp_path):
    from miseg_tpu.utils.logging import MetricLogger
    lg = MetricLogger(tmp_path, quiet=True)
    lg.log({"a": 1.5}, step=3)
    lg.log({"b": 2.0})
    lg.finish()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["a"] == 1.5 and lines[0]["step"] == 3
    assert "b" in lines[1]


def test_step_timer():
    from miseg_tpu.utils.profiling import StepTimer
    t = StepTimer(skip_first=1)
    import time
    for _ in range(3):
        t.start()
        time.sleep(0.01)
        t.stop()
    assert t.steps_per_sec > 0


def test_cli_parser_roundtrip():
    parser = build_parser()
    args = parser.parse_args([
        "--model_name", "swin_unetr", "--feature_size", "48",
        "--num_heads", "3", "--encoder_norm_name", "instance_cond",
        "--vit_norm_name", "instance_cond", "--lr", "1e-4",
        "--batch_size", "1", "--patches_training_sample", "1",
        "--max_epochs", "2500", "--use_checkpoint",
        "--data_dirs", "a", "b", "--json_lists", "CT_fold1.json", "MR.json"])
    cfg = Config.from_args(args)
    assert cfg.model_name == "swin_unetr"
    assert cfg.feature_size_scalar == 48
    assert cfg.use_checkpoint is True
    assert cfg.lr == 1e-4
    assert cfg.json_lists == ["CT_fold1.json", "MR.json"]
    assert cfg.roi == (96, 96, 96)


def test_sync_wandb_lists_offline(tmp_path, capsys):
    from miseg_tpu.cli import sync_wandb
    (tmp_path / "offline-run-x").mkdir()
    sync_wandb.main(["--dir", str(tmp_path)])
    out = capsys.readouterr().out
    assert "offline-run-x" in out or "pending sync" in out


def test_pallas_dispatch_flag_precedence(monkeypatch):
    from miseg_tpu.ops import dispatch
    cases = [
        # (MISEG_PALLAS, MISEG_PALLAS_NORM, expected use_pallas_norm)
        (None, None, False),       # default off
        ("1", None, True),         # global on
        ("1", "0", False),         # per-kernel off overrides global on
        ("0", "1", True),          # per-kernel on overrides global off
        ("1", "OFF", False),       # case-insensitive
        ("1", "", True),           # empty = unset → inherit global
        ("False", None, False),    # case-insensitive global
    ]
    for glob, norm, want in cases:
        dispatch.clear_cache()
        for k in ("MISEG_PALLAS", "MISEG_PALLAS_NORM", "MISEG_PALLAS_ATTN"):
            monkeypatch.delenv(k, raising=False)
        if glob is not None:
            monkeypatch.setenv("MISEG_PALLAS", glob)
        if norm is not None:
            monkeypatch.setenv("MISEG_PALLAS_NORM", norm)
        assert dispatch.use_pallas_norm() == want, (glob, norm)
    dispatch.clear_cache()


def test_dashboard_http_ui(tmp_path):
    """The dashboard serves the SPA at / and the JSON report at /api."""
    import threading
    import urllib.request
    from http.server import HTTPServer

    from miseg_tpu.cli import dashboard
    from miseg_tpu.hpo import create_study

    storage = str(tmp_path / "j.jsonl")
    study = create_study(study_name="s", storage=storage)

    def objective(t):
        x = t.suggest_float("x", 0, 1)
        for step in range(3):
            t.report(x * (step + 1), step)
        return x

    study.optimize(objective, n_trials=2)

    # reuse main()'s handler wiring by serving on an ephemeral port
    import json as _json
    from functools import partial

    report = dashboard.study_report(storage, "s")
    assert [s for s, _ in report["trials"][0]["intermediate"]] == [0, 1, 2]

    import socket
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/api"):
                body = _json.dumps(dashboard.study_report(storage, "s")).encode()
                ctype = "application/json"
            else:
                body = dashboard._PAGE.encode()
                ctype = "text/html; charset=utf-8"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        html = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=5).read().decode()
        assert "Optimization history" in html and "svg" in html
        api = _json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/report", timeout=5).read())
        assert api["n_trials"] == 2 and api["best"] is not None
    finally:
        srv.shutdown()
