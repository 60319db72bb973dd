"""`serve` — HTTP inference server over an AOT serving bundle.

No reference analog: the reference's deployment is "run predict_whs.py
inside the full torch/MONAI/Lightning stack" (predict_whs.py:35-114).
Here the deployable unit is the StableHLO bundle (serve.py) and this
module is the thin serving skin around it: a stdlib ThreadingHTTPServer
that accepts NIfTI volumes, runs the SAME deterministic preprocessing
chain as offline eval (orient→resample→scale→pad, data/multi_modal.py
eval_transforms), the bundle's compiled sliding-window prediction, the
inverse transforms back to native voxel space, and returns the
segmentation as a NIfTI — i.e. predict_whs.py semantics as a service.

    python -m miseg_tpu.cli.serve --bundle bundles/cswin_fs48 --port 8093

Endpoints:
    GET  /health              -> 200 JSON: bundle meta + status
    POST /predict?modality=0  -> body: .nii / .nii.gz bytes
         [&remap=whs]            response: .nii.gz segmentation (native
         [&mode=gaussian]         space; class ids, or MM-WHS label
                                  values with remap=whs)

Device dispatch is single-threaded by design (one TPU program at a
time): requests serialize around a lock; preprocessing/IO threads
overlap freely.
"""

from __future__ import annotations

import argparse
import gzip
import io
import json
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import jax.numpy as jnp
import numpy as np

from ..data import transforms as T
from ..data.nifti import save_nifti
from ..serve import ServedModel, load_bundle
from .predict_whs import MMWHS_LABEL_MAP, remap_labels


def _eval_chain(meta: dict) -> T.Compose:
    """The offline eval preprocessing chain, rebuilt from bundle meta
    (mirrors data/multi_modal.py eval_transforms; reference
    predict_whs.py:44-60)."""
    keys = ["image", "label"]
    return T.Compose([
        T.LoadImaged(keys=keys, allow_missing_keys=True),
        T.EnsureChannelLastd(keys=keys, allow_missing_keys=True),
        T.Orientationd(keys=keys, axcodes="RAS", allow_missing_keys=True),
        T.Spacingd(keys=keys, pixdim=tuple(meta["spacing"]),
                   mode=("bilinear", "nearest"), allow_missing_keys=True),
        T.ScaleIntensityd(keys=["image"]),
        T.SpatialPadd(keys=keys, spatial_size=tuple(meta["roi"]), value=0,
                      allow_missing_keys=True),
        T.ToTensord(keys=keys),
    ])


class InferenceService:
    """Bundle + preprocessing chain + device lock: one `infer` call is
    one native-space segmentation."""

    def __init__(self, served: ServedModel):
        self.served = served
        self.chain = _eval_chain(served.meta)
        self._device_lock = threading.Lock()

    def infer(self, nifti_bytes: bytes, modality: int, *,
              mode: str = "gaussian", remap: str | None = None) -> bytes:
        # the transform chain loads from a path; stage the upload
        suffix = ".nii.gz" if nifti_bytes[:2] == b"\x1f\x8b" else ".nii"
        with tempfile.NamedTemporaryFile(suffix=suffix) as f:
            f.write(nifti_bytes)
            f.flush()
            # "label"=image records the invertible ops (predict_whs.py:89-92)
            sample = self.chain({"image": f.name, "label": f.name})

        image = jnp.asarray(sample["image"])[None]
        mods = jnp.asarray([modality], jnp.int32)
        with self._device_lock:
            logits = self.served.predict(image, mods, mode=mode)
        pred = np.asarray(jnp.argmax(logits[0], axis=-1), np.int32)

        inv = dict(sample)
        inv["label"] = pred[..., None].astype(np.float32)
        inverted = self.chain.inverse(inv, key="label")
        final = np.rint(np.asarray(inverted["label"])).astype(np.int32)
        if remap == "whs":
            final = remap_labels(final, MMWHS_LABEL_MAP)

        affine = sample["image_meta"]["original_affine"]
        with tempfile.TemporaryDirectory() as d:
            out_path = f"{d}/pred.nii.gz"
            save_nifti(out_path, final.astype(np.uint16), affine)
            return open(out_path, "rb").read()


def make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if urlparse(self.path).path == "/health":
                self._json(200, {"status": "ok", **service.served.meta})
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/predict":
                self._json(404, {"error": f"no route {url.path}"})
                return
            q = parse_qs(url.query)
            try:
                modality = int(q.get("modality", ["0"])[0])
                mode = q.get("mode", ["gaussian"])[0]
                remap = q.get("remap", [None])[0]
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    raise ValueError("empty body (expect NIfTI bytes)")
                body = self.rfile.read(length)
                if self.headers.get("Content-Encoding") == "gzip":
                    body = gzip.GzipFile(fileobj=io.BytesIO(body)).read()
                out = service.infer(body, modality, mode=mode, remap=remap)
            except Exception as e:  # noqa: BLE001 — report, don't kill the server
                self._json(400, {"error": f"{type(e).__name__}: {e}"})
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/gzip")
            self.send_header("Content-Disposition",
                             'attachment; filename="pred.nii.gz"')
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

    return Handler


def make_server(bundle_dir: str, host: str = "127.0.0.1",
                port: int = 8093) -> ThreadingHTTPServer:
    served = load_bundle(bundle_dir)
    service = InferenceService(served)
    return ThreadingHTTPServer((host, port), make_handler(service))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--bundle", required=True,
                   help="serving bundle dir (from miseg_tpu.cli.export)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8093)
    args = p.parse_args(argv)
    server = make_server(args.bundle, args.host, args.port)
    print(f"serving {args.bundle} on http://{args.host}:{server.server_port} "
          f"(GET /health, POST /predict?modality=N)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
