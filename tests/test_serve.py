"""HTTP serving surface test (tiny model, real socket)."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import pytest


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import orbax.checkpoint as ocp

    from siss_tpu.models import UNet2D
    from siss_tpu.models.unet2d import UNet2DConfig

    def tiny_serve():
        return UNet2DConfig(sample_size=16, in_channels=1, out_channels=1,
                            block_out_channels=(16, 32), layers_per_block=1,
                            down_block_types=("DownBlock2D", "DownBlock2D"),
                            up_block_types=("UpBlock2D", "UpBlock2D"), norm_num_groups=8)

    UNet2DConfig.tiny_serve = staticmethod(tiny_serve)
    ckpt = str(tmp_path_factory.mktemp("serve") / "params")
    model = UNet2D(tiny_serve())
    with ocp.StandardCheckpointer() as ck:
        ck.save(ckpt, model.init_params(jax.random.PRNGKey(0)))

    from siss_tpu.serve import SamplerService, make_handler

    svc = SamplerService(ckpt, arch="tiny_serve")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


@pytest.mark.slow
def test_healthz(server):
    h = json.loads(urllib.request.urlopen(f"{server}/healthz").read())
    assert h["ok"] and h["model"] == "tiny_serve"


@pytest.mark.slow
def test_sample_returns_png_and_caches_compile(server):
    req = urllib.request.Request(
        f"{server}/sample",
        data=json.dumps({"n": 1, "steps": 4, "seed": 1, "sampler": "dpm"}).encode(),
        headers={"Content-Type": "application/json"})
    png = urllib.request.urlopen(req).read()
    assert png[:4] == b"\x89PNG"
    h = json.loads(urllib.request.urlopen(f"{server}/healthz").read())
    assert [1, 4, "dpm"] in h["compiled"]


@pytest.mark.slow
def test_bad_input_is_400(server):
    req = urllib.request.Request(f"{server}/sample", data=json.dumps({"n": "x"}).encode(),
                                 headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
