"""`dashboard` — HPO study status report from the journal storage.

Reference parity: `utils/run_server.py:6-27` serves optuna-dashboard on a
JournalStorage log (port 8080).  optuna-dashboard is not in this image;
this renders the same information — per-trial state, best value, params —
as a console/JSON report, and can optionally serve it over HTTP with the
stdlib server (same "inspect a running study" capability).
"""

from __future__ import annotations

import argparse
import json

from ..hpo import create_study


def study_report(storage: str, study_name: str = "study") -> dict:
    study = create_study(study_name=study_name, storage=storage,
                         load_if_exists=True)
    trials = [{
        "number": t.number, "state": t.state, "value": t.value,
        "params": t.params,
        "reported": len(t.intermediate),
    } for t in study.trials]
    best = study.best_trial
    return {"study": study_name, "n_trials": len(trials),
            "best": ({"number": best.number, "value": best.value,
                      "params": best.params} if best else None),
            "trials": trials}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--storage", required=True)
    p.add_argument("--study_name", default="study")
    p.add_argument("--port", type=int, default=None,
                   help="serve the report as JSON over HTTP")
    args = p.parse_args(argv)
    report = study_report(args.storage, args.study_name)
    if args.port is None:
        print(json.dumps(report, indent=2))
        return
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps(study_report(args.storage, args.study_name),
                              indent=2).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    print(f"serving study report on :{args.port}")
    HTTPServer(("0.0.0.0", args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
