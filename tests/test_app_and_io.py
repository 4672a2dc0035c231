"""Annotation session (app backend), video IO, and SA-V RLE decoding."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    path = str(root / "test.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 80))
    rng = np.random.default_rng(0)
    for t in range(5):
        frame = (rng.random((80, 96, 3)) * 255).astype(np.uint8)
        frame[30 + t : 55 + t, 20 + t : 45 + t] = (255, 255, 255)
        w.write(frame)
    w.release()
    return path


@pytest.fixture(scope="module")
def mini_predictor():
    """One compiled MINI predictor shared by the session/click/HTTP tests
    (each instance carries its own jit wrappers, so sharing saves two full
    XLA CPU compiles on this 1-vCPU box)."""
    from tests.conftest import require_fixture
    from tests.test_parity import MINI
    from us_video_medsam2_tpu.core.import_torch import convert_reference_state_dict
    from us_video_medsam2_tpu.inference.video_predictor import SAM2VideoPredictor
    from us_video_medsam2_tpu.models.sam2 import SAM2Model

    sd = dict(np.load(require_fixture("mini_state_dict.npz")))
    params = convert_reference_state_dict(sd, MINI)
    return SAM2VideoPredictor(SAM2Model(MINI), params, fill_hole_area=0)


def test_load_video_frames(video_file):
    from us_video_medsam2_tpu.utils.video_io import load_video_frames

    frames, vh, vw = load_video_frames(video_file, image_size=64)
    assert frames.shape == (5, 64, 64, 3)
    assert (vh, vw) == (80, 96)


def test_async_frame_loader(tmp_path):
    from PIL import Image

    from us_video_medsam2_tpu.utils.video_io import AsyncVideoFrameLoader

    paths = []
    for i in range(4):
        p = str(tmp_path / f"{i}.jpg")
        Image.fromarray(np.full((32, 40, 3), i * 40, np.uint8)).save(p)
        paths.append(p)
    loader = AsyncVideoFrameLoader(paths, image_size=32)
    assert len(loader) == 4
    for i in range(4):
        assert loader[i].shape == (32, 32, 3)
    assert loader.video_height == 32 and loader.video_width == 40


def test_annotation_session(video_file, mini_predictor):
    from us_video_medsam2_tpu.apps.app import AnnotationSession

    sess = AnnotationSession(mini_predictor, video_file)
    obj_ids, masks = sess.click(0, 1, 32.0, 42.0, positive=True)
    assert masks.shape[0] == 8  # max_objects slots
    tracked = sess.track()
    assert set(tracked) == {0, 1, 2, 3, 4}
    out_dir = os.path.join(os.path.dirname(video_file), "export")
    mp4, zf = sess.export(out_dir)
    assert os.path.exists(mp4) and os.path.exists(zf)
    import zipfile

    with zipfile.ZipFile(zf) as z:
        assert len(z.namelist()) == 5


def test_http_api_end_to_end(video_file, mini_predictor):
    """Drive upload -> click -> track -> export through REAL HTTP round trips
    against the stdlib serving surface (apps/http_api.py) — the headless
    equivalent of the reference's Gradio flow (reference app.py:111-449:
    load_video -> on_click -> on_track -> download). Gradio itself is not
    installed in this environment; the HTTP API serves the same session layer
    the Gradio callbacks wire."""
    import io
    import json
    import threading
    import urllib.error
    import urllib.request
    import zipfile

    from us_video_medsam2_tpu.apps.http_api import create_server

    server = create_server(mini_predictor, port=0)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        def call(method, path, body=None, headers=None):
            req = urllib.request.Request(
                base + path, data=body, method=method, headers=headers or {}
            )
            with urllib.request.urlopen(req, timeout=300) as resp:
                return resp.headers.get_content_type(), resp.read()

        ctype, body = call("GET", "/healthz")
        assert json.loads(body)["ok"] is True

        # upload: the raw mp4 bytes travel over the wire like a browser upload
        with open(video_file, "rb") as f:
            video_bytes = f.read()
        ctype, body = call(
            "POST", "/sessions", video_bytes, {"X-Filename": "test.mp4"}
        )
        meta = json.loads(body)
        sid = meta["session_id"]
        assert meta["num_frames"] == 5 and (meta["height"], meta["width"]) == (80, 96)

        # click the white square on frame 0
        ctype, body = call(
            "POST",
            f"/sessions/{sid}/click",
            json.dumps(
                {"frame_idx": 0, "obj_id": 1, "x": 32.0, "y": 42.0, "positive": True}
            ).encode(),
        )
        click_resp = json.loads(body)
        assert click_resp["obj_ids"] == [1]
        assert len(click_resp["areas"]) == 1

        ctype, body = call("POST", f"/sessions/{sid}/track", b"{}")
        frames = json.loads(body)["frames"]
        assert sorted(int(k) for k in frames) == [0, 1, 2, 3, 4]

        ctype, body = call("GET", f"/sessions/{sid}/export/masks.zip")
        assert ctype == "application/zip"
        with zipfile.ZipFile(io.BytesIO(body)) as z:
            assert len(z.namelist()) == 5
            first = z.read(sorted(z.namelist())[0])
            assert first[:8] == b"\x89PNG\r\n\x1a\n"

        ctype, body = call("GET", f"/sessions/{sid}/export/tracked.mp4")
        assert ctype == "video/mp4" and len(body) > 0

        # close, then the session must be gone (reaper/unload semantics)
        call("DELETE", f"/sessions/{sid}")
        try:
            call("POST", f"/sessions/{sid}/track", b"{}")
            raise AssertionError("expected 404 on a closed session")
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        server.shutdown()
        server.server_close()


def test_coco_rle_decode_uncompressed():
    from us_video_medsam2_tpu.inference.amg import mask_to_rle
    from us_video_medsam2_tpu.training.data import decode_coco_rle

    rng = np.random.default_rng(0)
    m = rng.random((17, 23)) > 0.5
    rle = mask_to_rle(m)
    np.testing.assert_array_equal(decode_coco_rle(rle), m)


def test_coco_rle_decode_compressed_string():
    """Encode with the COCO char scheme ourselves and decode."""
    from us_video_medsam2_tpu.training.data import decode_coco_rle

    def encode_counts(counts):
        # pycocotools rleToString
        s = bytearray()
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = (x != -1) if (c & 0x10) else (x != 0)
                if more:
                    c |= 0x20
                s.append(c + 48)
        return bytes(s)

    rng = np.random.default_rng(1)
    m = rng.random((9, 11)) > 0.4
    flat = m.T.ravel()
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    idx = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(idx).tolist()
    if flat[0]:
        counts = [0] + counts
    rle = {"size": [9, 11], "counts": encode_counts(counts).decode()}
    np.testing.assert_array_equal(decode_coco_rle(rle), m)


def test_session_manager_reaper():
    """Idle sessions are dropped after max_idle_s (reference app.py:408-450
    child-process reaper, recast as state eviction)."""
    import time

    from us_video_medsam2_tpu.apps.app import SessionManager

    mgr = SessionManager(max_idle_s=0.2)
    mgr.put("a", object())
    mgr.put("b", object())
    assert len(mgr) == 2
    mgr.get("a")  # touch
    assert mgr.reap(now=time.monotonic()) == []  # nothing idle yet
    time.sleep(0.3)
    dead = mgr.reap()
    assert sorted(dead) == ["a", "b"]
    assert len(mgr) == 0
    # close() is idempotent
    mgr.put("c", object())
    mgr.close("c")
    mgr.close("c")
    assert len(mgr) == 0


def test_predictor_registry_caches(monkeypatch):
    from us_video_medsam2_tpu.apps import app as app_mod
    from us_video_medsam2_tpu.core import build as build_mod

    calls = []

    def fake_build(cfg, ckpt):
        calls.append((cfg, ckpt))
        return object()

    monkeypatch.setattr(build_mod, "build_sam2_video_predictor", fake_build)
    reg = app_mod.PredictorRegistry(
        {"tiny": ("sam2.1_hiera_t512", None), "eff": ("efficienttam_ti_512", "x.pt")}
    )
    assert reg.names() == ["tiny", "eff"]
    p1 = reg.get("tiny")
    p2 = reg.get("tiny")
    assert p1 is p2 and calls == [("sam2.1_hiera_t512", None)]
    reg.get("eff")
    assert calls[-1] == ("efficienttam_ti_512", "x.pt")


def test_click_path_single_dispatch(mini_predictor):
    """The interactive click costs ONE device dispatch: the video-res upsample
    is fused into the prompt jit, so the separate _to_video_res program must
    not run (reference pays a fresh dispatch per click, app.py:143-178)."""
    predictor = mini_predictor
    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, 256, 256, 3)).astype(np.float32)
    state = predictor.init_state(images, 120, 100, max_objects=2)

    def boom(*a, **k):  # noqa: ANN001
        raise AssertionError("_to_video_res dispatched on the click path")

    orig = predictor._to_video_res
    predictor._to_video_res = boom
    try:
        fi, obj_ids, masks = predictor.add_new_points_or_box(
            state, 0, 1, points=np.array([[20.0, 20.0]]), labels=np.array([1])
        )
    finally:
        predictor._to_video_res = orig  # the fixture is module-shared
    assert fi == 0 and obj_ids == [1]
    assert masks.shape[0] == state.max_objects and masks.shape[1] == 1
    assert np.isfinite(masks).all()


def test_coco_rle_vectorized_matches_scalar_and_is_fast():
    """The vectorized decoder must agree bit-exactly with the literal
    pycocotools-port loop on SA-V-scale (1080p) masks and beat it by a wide
    margin (VOS JSON training loads thousands per epoch). Measured on this
    1-vCPU box: ~30 ms vs ~0.9 s (~24-30x) on the worst case, a 1M-run noise
    mask; the assert is set below the measurement to survive box jitter."""
    import time

    from us_video_medsam2_tpu.training.data import (
        _decode_coco_rle_scalar,
        decode_coco_rle,
    )

    def encode_counts(counts):
        # pycocotools rleToString
        s = bytearray()
        for i, x in enumerate(counts):
            if i > 2:
                x -= counts[i - 2]
            more = True
            while more:
                c = x & 0x1F
                x >>= 5
                more = (x != -1) if (c & 0x10) else (x != 0)
                if more:
                    c |= 0x20
                s.append(c + 48)
        return bytes(s)

    def encode(m):
        flat = m.T.ravel()
        change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
        idx = np.concatenate([[0], change, [flat.size]])
        counts = np.diff(idx).tolist()
        if flat[0]:
            counts = [0] + counts
        return {"size": list(m.shape), "counts": encode_counts(counts).decode()}

    rng = np.random.default_rng(7)
    # blobby 1080p mask (realistic run lengths), plus adversarial tiny/noisy ones
    yy, xx = np.mgrid[:1080, :1920]
    blob = np.zeros((1080, 1920), bool)
    for _ in range(12):
        cy, cx = rng.integers(0, 1080), rng.integers(0, 1920)
        r = rng.integers(40, 300)
        blob |= (yy - cy) ** 2 + (xx - cx) ** 2 < r**2
    cases = [
        blob,
        rng.random((1080, 1920)) > 0.999,  # sparse speckle -> long tokens
        rng.random((5, 3)) > 0.5,
        np.zeros((16, 16), bool),
        np.ones((16, 16), bool),
    ]
    for m in cases:
        rle = encode(m)
        np.testing.assert_array_equal(decode_coco_rle(rle), m)
        np.testing.assert_array_equal(_decode_coco_rle_scalar(rle), m)

    # timing case: ~1M runs (the scalar loop's cost is per run; blobby masks
    # with few runs were already cheap either way)
    noisy = rng.random((1080, 1920)) > 0.5
    rle = encode(noisy)
    np.testing.assert_array_equal(decode_coco_rle(rle), noisy)
    t0 = time.perf_counter()
    for _ in range(5):
        decode_coco_rle(rle)
    fast = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    _decode_coco_rle_scalar(rle)
    slow = time.perf_counter() - t0
    assert slow / fast > 15, f"vectorized decode only {slow / fast:.1f}x faster"


# --------------------------------------------------- gradio build_demo drive


def _make_gradio_shim():
    """Minimal stand-in for the gradio API surface build_demo uses, so the
    REAL UI wiring (load -> click -> track -> export -> unload, reference
    app.py:452-530) executes end-to-end although gradio itself is not
    installable in this environment. Components record their event handlers;
    the test invokes them exactly as gradio would."""
    import types

    shim = types.ModuleType("gradio")
    shim._components = []

    class _Component:
        def __init__(self, *args, **kwargs):
            self.args, self.kwargs = args, kwargs
            self.label = kwargs.get("label") or (args[0] if args else None)
            self.handlers = {}
            shim._components.append(self)

        def _register(self, event, fn, inputs=None, outputs=None):
            self.handlers[event] = (fn, inputs or [], outputs or [])

        def change(self, fn, inputs=None, outputs=None):
            self._register("change", fn, inputs, outputs)

        def select(self, fn, inputs=None, outputs=None):
            self._register("select", fn, inputs, outputs)

        def click(self, fn, inputs=None, outputs=None):
            self._register("click", fn, inputs, outputs)

    for name in (
        "Markdown", "Dropdown", "Video", "Image", "Slider", "Number",
        "Checkbox", "Button", "File",
    ):
        setattr(shim, name, type(name, (_Component,), {}))

    class Row:
        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def __init__(self, *a, **k):
            pass

    class Blocks(Row):
        def __init__(self, *a, **k):
            self.unload_fn = None

        def unload(self, fn):
            self.unload_fn = fn

    class Error(Exception):
        pass

    shim.Row, shim.Blocks, shim.Error = Row, Blocks, Error
    shim.Request = type("Request", (), {})
    shim.SelectData = type("SelectData", (), {})
    shim.update = lambda **kw: {"__type__": "update", **kw}
    return shim


def test_gradio_build_demo_full_flow(video_file, mini_predictor, monkeypatch):
    """Drive build_demo's real callbacks through the shim: load a video, click
    an object, track, export mp4+zip, then expire the session."""
    import sys
    import zipfile

    from us_video_medsam2_tpu.core import build as build_mod

    shim = _make_gradio_shim()
    monkeypatch.setitem(sys.modules, "gradio", shim)
    monkeypatch.setattr(
        build_mod, "build_sam2_video_predictor", lambda cfg, ckpt: mini_predictor
    )

    from us_video_medsam2_tpu.apps.app import build_demo

    demo = build_demo(model_choices={"mini": ("mini", None)}, max_idle_s=1e9)

    def find(cls_name, label=None):
        return next(
            c for c in shim._components
            if type(c).__name__ == cls_name and (label is None or c.label == label)
        )

    video_in = find("Video", "input video")
    frame_view = find("Image", "frame")
    track_btn = find("Button", "Track")
    req = shim.Request()
    req.session_hash = "sess-1"

    # load: first frame overlay + slider range update
    load_fn, _, _ = video_in.handlers["change"]
    frame0, slider_update = load_fn(video_file, "mini", req)
    assert frame0.shape == (80, 96, 3) and frame0.dtype == np.uint8
    assert slider_update["maximum"] == 4 and slider_update["value"] == 0

    # click the white square on frame 0 -> overlay changes where the mask is
    evt = shim.SelectData()
    evt.index = (32, 42)  # (x, y) inside the square
    click_fn, _, _ = frame_view.handlers["select"]
    overlay = click_fn(0, 1, True, evt, req)
    assert overlay.shape == (80, 96, 3)
    assert (overlay != frame0).any(), "click must paint an object overlay"

    # track + export
    track_fn, _, _ = track_btn.handlers["click"]
    mp4, zf = track_fn(req)
    assert os.path.exists(mp4) and os.path.getsize(mp4) > 0
    with zipfile.ZipFile(zf) as z:
        names = z.namelist()
        assert len(names) == 5  # one mask png per frame
        import cv2 as _cv2

        png = np.frombuffer(z.read(names[0]), np.uint8)
        mask = _cv2.imdecode(png, _cv2.IMREAD_GRAYSCALE)
        assert (mask == 1).sum() > 0, "exported mask must contain object 1"

    # unload -> the session is gone -> the click handler raises gr.Error
    demo.unload_fn(req)
    with pytest.raises(shim.Error):
        click_fn(0, 1, True, evt, req)
