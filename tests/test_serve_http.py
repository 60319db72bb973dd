"""HTTP serving skin over the AOT bundle (cli/serve.py).

No reference analog (its deployment is offline predict_whs.py); this
certifies the service end-to-end over a real socket: bundle export →
server → POST a native-space NIfTI → preprocessing chain → compiled
sliding-window predict → inverse transforms → NIfTI response in the
ORIGINAL voxel grid, plus health/error handling."""

import gzip
import json
import tempfile
import threading
import urllib.error
import urllib.request

import numpy as np
import jax
import pytest

from miseg_tpu.config import Config
from miseg_tpu.data.nifti import load_nifti, save_nifti
from miseg_tpu.models import model_from_config
from miseg_tpu.serve import export_bundle


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_http")
    cfg = Config(model_name="unet", roi_x=16, roi_y=16, roi_z=16,
                 out_channels=3, feature_size=[8], num_layers=2, strides=[2],
                 num_res_units=1, encoder_norm_name="instance_cond",
                 decoder_norm_name="instance", no_amp=True, precision="fp32")
    model = model_from_config(cfg)
    params = model.init({"params": jax.random.key(0)},
                        np.zeros((1, 16, 16, 16, 1), np.float32),
                        np.zeros((1,), np.int32))["params"]
    bundle = export_bundle(cfg, params, root / "bundle", platforms=("cpu",))

    from miseg_tpu.cli.serve import make_server
    srv = make_server(str(bundle), port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _synthetic_nifti(path, shape=(20, 18, 22)):
    rng = np.random.default_rng(3)
    vol = rng.random(shape).astype(np.float32)
    affine = np.diag([1.5, 1.0, 1.2, 1.0])  # anisotropic: exercises Spacingd
    save_nifti(str(path), vol, affine)
    return vol, affine


def test_health(server):
    with urllib.request.urlopen(f"{server}/health") as r:
        meta = json.loads(r.read())
    assert meta["status"] == "ok"
    assert meta["roi"] == [16, 16, 16] and meta["out_channels"] == 3
    assert "spacing" in meta


def test_predict_roundtrip_native_space(server, tmp_path):
    src = tmp_path / "vol_image.nii.gz"
    vol, affine = _synthetic_nifti(src)
    req = urllib.request.Request(
        f"{server}/predict?modality=1", data=src.read_bytes(), method="POST")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        out = r.read()
    dst = tmp_path / "pred.nii.gz"
    dst.write_bytes(out)
    pred = load_nifti(str(dst))
    # native space: original shape + affine, class-id values
    assert pred.data.shape == vol.shape
    np.testing.assert_allclose(pred.affine, affine, atol=1e-3)
    assert set(np.unique(pred.data)).issubset({0, 1, 2})


def test_predict_whs_remap(server, tmp_path):
    src = tmp_path / "vol2_image.nii.gz"
    _synthetic_nifti(src, shape=(16, 16, 16))
    req = urllib.request.Request(
        f"{server}/predict?modality=0&remap=whs&mode=constant",
        data=src.read_bytes(), method="POST")
    with urllib.request.urlopen(req) as r:
        out = r.read()
    dst = tmp_path / "pred2.nii.gz"
    dst.write_bytes(out)
    pred = load_nifti(str(dst))
    assert set(np.unique(pred.data)).issubset({0, 500, 600})


def test_gzip_body_transparently_decoded(server, tmp_path):
    """Content-Encoding: gzip wraps the (already .nii.gz) payload once
    more; the server must unwrap the transport layer before sniffing."""
    src = tmp_path / "vol3_image.nii.gz"
    _synthetic_nifti(src, shape=(16, 16, 16))
    req = urllib.request.Request(
        f"{server}/predict?modality=0", data=gzip.compress(src.read_bytes()),
        method="POST", headers={"Content-Encoding": "gzip"})
    with urllib.request.urlopen(req) as r:
        assert r.status == 200


def test_errors_are_json_400s(server):
    req = urllib.request.Request(f"{server}/predict?modality=0",
                                 data=b"not a nifti", method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req)
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{server}/nope")
    assert ei.value.code == 404


def test_http_predict_through_baked_volume_program(tmp_path):
    """HTTP arm over a --export_bake_params bundle: an isotropic 20^3
    upload preprocesses to exactly (20, 20, 20), which must route
    through the BAKED whole-volume program (weights as constants, the
    ~1.0x serving path — VERDICT r4 #7), not the window fallback."""
    cfg = Config(model_name="unet", roi_x=16, roi_y=16, roi_z=16,
                 out_channels=3, feature_size=[8], num_layers=2, strides=[2],
                 num_res_units=1, encoder_norm_name="instance_cond",
                 decoder_norm_name="instance", no_amp=True, precision="fp32")
    model = model_from_config(cfg)
    params = model.init({"params": jax.random.key(0)},
                        np.zeros((1, 16, 16, 16, 1), np.float32),
                        np.zeros((1,), np.int32))["params"]
    bundle = export_bundle(cfg, params, tmp_path / "bundle",
                           platforms=("cpu",), volume_shapes=[(20, 20, 20)],
                           bake_params=True)

    from miseg_tpu.cli.serve import InferenceService, make_handler
    from miseg_tpu.serve import load_bundle
    from http.server import ThreadingHTTPServer
    service = InferenceService(load_bundle(bundle))
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        src = tmp_path / "iso_image.nii.gz"
        rng = np.random.default_rng(7)
        save_nifti(str(src), rng.random((20, 20, 20)).astype(np.float32),
                   np.eye(4))
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.server_port}/predict?modality=0",
            data=src.read_bytes(), method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        # the request really took the baked volume program
        prog = service.served._volume_fns.get("20x20x20")
        assert prog is not None
        assert service.served.meta["volume_programs"][0]["params_baked"]
    finally:
        srv.shutdown()
