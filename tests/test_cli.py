"""CLI end-to-end tests: run.py on a folder, infer.py -> eval.py roundtrip
(the two-process zero-shot protocol), train.py debug run."""

import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image

from fixtures import make_tiny_checkpoint


@pytest.fixture(scope="module")
def depth_ckpt(tmp_path_factory):
    return make_tiny_checkpoint(str(tmp_path_factory.mktemp("ck")), mode="depth")


def test_cli_run_depth(depth_ckpt, tmp_path, rng):
    from marigold_tpu.cli.run import main

    in_dir = tmp_path / "in"
    os.makedirs(in_dir)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
        ).save(in_dir / f"img{i}.png")
    out_dir = tmp_path / "out"
    rc = main([
        "--modality", "depth",
        "--checkpoint", depth_ckpt,
        "--input_rgb_dir", str(in_dir),
        "--output_dir", str(out_dir),
        "--denoise_steps", "1",
        "--ensemble_size", "1",
        "--processing_res", "32",
        "--full_precision",
        "--seed", "1",
    ])
    assert rc == 0
    assert (out_dir / "depth_npy" / "img0_pred.npy").exists()
    assert (out_dir / "img0_depth_bw.png").exists()
    assert (out_dir / "img0_depth_colored.png").exists()
    pred = np.load(out_dir / "depth_npy" / "img1_pred.npy")
    assert pred.shape == (40, 48)
    bw = np.asarray(Image.open(out_dir / "img0_depth_bw.png"))
    assert bw.dtype == np.uint16


def test_cli_infer_eval_roundtrip(depth_ckpt, tmp_path, rng):
    from marigold_tpu.cli.eval import main as eval_main
    from marigold_tpu.cli.infer import main as infer_main

    # tiny NYU-style dataset
    root = tmp_path / "data" / "nyu"
    os.makedirs(root)
    names = []
    for i in range(2):
        rgb = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        depth_mm = rng.integers(500, 9000, (48, 64), dtype=np.uint16)
        Image.fromarray(rgb).save(root / f"rgb_{i:05d}.png")
        Image.fromarray(depth_mm).save(root / f"depth_{i:05d}.png")
        Image.fromarray(depth_mm).save(root / f"filled_{i:05d}.png")
        names.append(f"rgb_{i:05d}.png depth_{i:05d}.png filled_{i:05d}.png")
    (tmp_path / "split.txt").write_text("\n".join(names))
    ds_cfg = {
        "dataset": {
            "name": "nyu_depth",
            "disp_name": "tiny_nyu_test",
            "dir": "nyu",
            "filenames": str(tmp_path / "split.txt"),
            "eigen_valid_mask": False,
        }
    }
    cfg_path = tmp_path / "data_nyu_test.yaml"
    cfg_path.write_text(yaml.safe_dump(ds_cfg))

    out_dir = tmp_path / "preds"
    rc = infer_main([
        "--modality", "depth",
        "--checkpoint", depth_ckpt,
        "--dataset_config", str(cfg_path),
        "--base_data_dir", str(tmp_path / "data"),
        "--output_dir", str(out_dir),
        "--denoise_steps", "1",
        "--ensemble_size", "2",
        "--processing_res", "32",
        "--seed", "1234",
    ])
    assert rc == 0
    pred_dir = out_dir / "depth_npy"
    assert (pred_dir / "pred_00000.npy").exists()  # rgb_id naming mode

    eval_out = tmp_path / "eval"
    rc = eval_main([
        "--modality", "depth",
        "--dataset_config", str(cfg_path),
        "--base_data_dir", str(tmp_path / "data"),
        "--prediction_dir", str(pred_dir),
        "--output_dir", str(eval_out),
        "--alignment", "least_square",
    ])
    assert rc == 0
    assert (eval_out / "eval_metrics-least_square.txt").exists()
    assert (eval_out / "per_sample_metrics.csv").exists()
    txt = (eval_out / "eval_metrics-least_square.txt").read_text()
    assert "abs_relative_difference" in txt and "tiny_nyu_test" in txt


def test_cli_train_debug(tmp_path, rng):
    """Full train CLI on a debug config: 2 iters, checkpoint written."""
    from marigold_tpu.cli.train import main as train_main

    sd2 = make_tiny_checkpoint(str(tmp_path / "ckpt_base" / "sd2"), mode="sd2")

    root = tmp_path / "data" / "nyu"
    os.makedirs(root)
    names = []
    for i in range(4):
        rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        depth_mm = rng.integers(500, 9000, (64, 64), dtype=np.uint16)
        Image.fromarray(rgb).save(root / f"rgb_{i:05d}.png")
        Image.fromarray(depth_mm).save(root / f"depth_{i:05d}.png")
        Image.fromarray(depth_mm).save(root / f"filled_{i:05d}.png")
        names.append(f"rgb_{i:05d}.png depth_{i:05d}.png filled_{i:05d}.png")
    (tmp_path / "split.txt").write_text("\n".join(names))

    cfg = {
        "pipeline": {"name": "MarigoldDepthPipeline", "kwargs": {
            "scale_invariant": True, "shift_invariant": True,
            "default_denoising_steps": 1,
            "default_processing_resolution": 32,
        }},
        "model": {"name": "marigold_pipeline", "pretrained_path": "sd2"},
        "depth_normalization": {
            "type": "scale_shift_depth", "clip": True, "norm_min": -1.0,
            "norm_max": 1.0, "min_max_quantile": 0.02,
        },
        "augmentation": {"lr_flip_p": 0.5},
        "dataloader": {"num_workers": 0, "effective_batch_size": 2,
                       "max_train_batch_size": 1, "seed": 2024},
        "trainer": {"name": "MarigoldDepthTrainer", "init_seed": 2024,
                    "save_period": 2, "backup_period": 0,
                    "validation_period": 0, "visualization_period": 0},
        "multi_res_noise": {"strength": 0.9, "annealed": True,
                            "downscale_strategy": "original"},
        "gt_depth_type": "depth_raw_norm",
        "gt_mask_type": "valid_mask_raw",
        "max_epoch": 100, "max_iter": 2,
        "optimizer": {"name": "Adam"},
        "loss": {"name": "mse_loss", "kwargs": {"reduction": "mean"}},
        "lr": 1e-4,
        "lr_scheduler": {"name": "IterExponential", "kwargs": {
            "total_iter": 100, "final_ratio": 0.01, "warmup_steps": 0}},
        "validation": {"denoising_steps": 1, "ensemble_size": 1,
                       "processing_res": 0, "match_input_res": False,
                       "resample_method": "bilinear",
                       "main_val_metric": "abs_relative_difference",
                       "main_val_metric_goal": "minimize", "init_seed": 2024},
        "eval": {"alignment": "least_square", "align_max_res": None,
                 "eval_metrics": ["abs_relative_difference", "delta1_acc"]},
        "dataset": {
            "train": {"name": "mixed", "prob_ls": [1.0], "dataset_list": [
                {"name": "nyu_depth", "disp_name": "tiny_train", "dir": "nyu",
                 "filenames": str(tmp_path / "split.txt"),
                 "eigen_valid_mask": False}]},
            "val": [], "vis": [],
        },
        "logging": {"console_level": 30},
    }
    cfg_path = tmp_path / "train_cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    out_root = tmp_path / "runs"
    rc = train_main([
        "--config", str(cfg_path),
        "--output_dir", str(out_root),
        "--base_data_dir", str(tmp_path / "data"),
        "--base_ckpt_dir", str(tmp_path / "ckpt_base"),
        "--no_val",
    ])
    assert rc == 0
    runs = list(out_root.iterdir())
    assert len(runs) == 1
    run_dir = runs[0]
    assert (run_dir / "config.yaml").exists()
    assert (run_dir / "checkpoint" / "latest" / "unet" / "config.json").exists()
    assert (run_dir / "checkpoint" / "iter_000002").exists()
    # the saved unet is surgered (8 input channels)
    with open(run_dir / "checkpoint" / "latest" / "unet" / "config.json") as f:
        assert json.load(f)["in_channels"] == 8


def test_serve_once_depth(depth_ckpt, tmp_path, rng):
    """The serving daemon in --once mode: mixed-shape inputs are bucketed
    into same-shape fused batches, processed concurrently, and saved in
    the run.py output layout."""
    from marigold_tpu.cli.serve import main as serve_main

    watch = tmp_path / "watch"
    watch.mkdir()
    # two 64x48 images (one full batch) + one 48x64 (its own bucket)
    for name, (w, h) in [("a", (64, 48)), ("b", (64, 48)), ("c", (48, 64))]:
        arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(watch / f"{name}.png")

    out_dir = tmp_path / "out"
    rc = serve_main([
        "--checkpoint", depth_ckpt,
        "--modality", "depth",
        "--watch_dir", str(watch),
        "--output_dir", str(out_dir),
        "--batch_images", "2",
        "--ensemble_size", "2",
        "--denoise_steps", "1",
        "--processing_res", "32",
        "--seed", "7",
        "--once",
        "--color_map", "None",
    ])
    assert rc == 0
    for name, (w, h) in [("a", (64, 48)), ("b", (64, 48)), ("c", (48, 64))]:
        pred = np.load(out_dir / "depth_npy" / f"{name}_pred.npy")
        assert pred.shape == (h, w)
        assert np.isfinite(pred).all()
        assert (out_dir / f"{name}_depth_bw.png").exists()


def test_cli_train_rerun_does_not_overwrite_run_dir(tmp_path):
    """Without the datetime prefix, a rerun of the same config must refuse
    to reuse the previous run directory (reference train.py:163
    exist_ok=False) instead of silently interleaving outputs."""
    import pytest
    import yaml

    from marigold_tpu.cli.train import main as train_main

    cfg_path = tmp_path / "myrun.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump({"trainer": {"name": "MarigoldDepthTrainer"}}, f)
    out_dir = tmp_path / "out"
    os.makedirs(out_dir / "myrun")  # simulate a previous run's directory
    with pytest.raises(FileExistsError):
        train_main([
            "--config", str(cfg_path), "--output_dir", str(out_dir),
            "--no_val",
        ])


def test_serve_once_retries_partial_file(depth_ckpt, tmp_path, rng):
    """A file that fails to open (upload in progress) must be retried on a
    clock until it becomes readable — not burned through a per-iteration
    attempt budget or dropped by --once before its retry window."""
    import threading

    from marigold_tpu.cli.serve import main as serve_main

    watch = tmp_path / "watch"
    watch.mkdir()
    arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    Image.fromarray(arr).save(watch / "good.png")
    # a truncated copy of a valid PNG: Image.open fails until it is fixed
    import io

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    full = buf.getvalue()
    partial = watch / "late.png"
    partial.write_bytes(full[: len(full) // 2])

    def fix():
        partial.write_bytes(full)

    t = threading.Timer(1.5, fix)
    t.start()
    try:
        rc = serve_main([
            "--checkpoint", depth_ckpt,
            "--modality", "depth",
            "--watch_dir", str(watch),
            "--output_dir", str(tmp_path / "out"),
            "--batch_images", "1",
            "--ensemble_size", "1",
            "--denoise_steps", "1",
            "--processing_res", "32",
            "--poll_interval", "0.2",
            "--read_retry_window", "30",
            "--once",
            "--color_map", "None",
        ])
    finally:
        t.join()
    assert rc == 0
    assert (tmp_path / "out" / "depth_npy" / "good_pred.npy").exists()
    assert (tmp_path / "out" / "depth_npy" / "late_pred.npy").exists()


def test_serve_once_corrupt_file_reports_failure(depth_ckpt, tmp_path, rng):
    """A genuinely unreadable file is skipped after the retry window — and
    --once reports it in the exit code instead of silently returning 0."""
    from marigold_tpu.cli.serve import main as serve_main

    watch = tmp_path / "watch"
    watch.mkdir()
    arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    Image.fromarray(arr).save(watch / "good.png")
    (watch / "bad.png").write_bytes(b"\x89PNG not really")

    rc = serve_main([
        "--checkpoint", depth_ckpt,
        "--modality", "depth",
        "--watch_dir", str(watch),
        "--output_dir", str(tmp_path / "out"),
        "--batch_images", "1",
        "--ensemble_size", "1",
        "--denoise_steps", "1",
        "--processing_res", "32",
        "--poll_interval", "0.1",
        "--read_retry_window", "0.5",
        "--once",
        "--color_map", "None",
    ])
    assert rc == 1  # the skipped file is a reported failure
    assert (tmp_path / "out" / "depth_npy" / "good_pred.npy").exists()
    assert not (tmp_path / "out" / "depth_npy" / "bad_pred.npy").exists()


def test_wait_for_dir_rejects_stale_run_dir(tmp_path):
    """Non-main multihost processes must not latch onto a run dir left by
    a previous run (process 0 fails fast with FileExistsError in that
    case); only a marker carrying THIS run's broadcast token admits them."""
    from marigold_tpu.cli.train import _RUN_MARKER, _wait_for_dir

    stale = tmp_path / "run"
    stale.mkdir()  # pre-existing dir, no marker
    with pytest.raises(TimeoutError):
        _wait_for_dir(str(stale), "tok-a", timeout_s=1.0)

    (stale / _RUN_MARKER).write_text("tok-old")  # marker from another run
    with pytest.raises(TimeoutError):
        _wait_for_dir(str(stale), "tok-a", timeout_s=1.0)

    (stale / _RUN_MARKER).write_text("tok-a")
    _wait_for_dir(str(stale), "tok-a", timeout_s=1.0)  # returns


def test_serve_http_api(depth_ckpt, tmp_path, rng):
    """The HTTP serving API: POST /v1/predict joins the same device
    batches as watched files and returns the prediction in the response;
    /healthz reports stats; malformed requests get 4xx."""
    import io
    import threading
    import urllib.error
    import urllib.request

    from marigold_tpu.cli.serve import build_parser, serve

    watch = tmp_path / "watch"
    watch.mkdir()
    port = _serve_free_port()
    args = build_parser().parse_args([
        "--checkpoint", depth_ckpt,
        "--modality", "depth",
        "--watch_dir", str(watch),
        "--output_dir", str(tmp_path / "out"),
        "--batch_images", "1",
        "--ensemble_size", "1",
        "--denoise_steps", "1",
        "--processing_res", "32",
        "--poll_interval", "0.1",
        "--batch_wait", "0.2",
        "--http_port", str(port),
        "--color_map", "None",
    ])
    stop = threading.Event()
    t = threading.Thread(target=serve, args=(args, stop), daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        # wait for the server socket
        deadline = 60
        import time as _time

        for _ in range(600):
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=5) as r:
                    assert r.status == 200
                    break
            except Exception:
                _time.sleep(0.1)
        else:
            raise AssertionError("http server never came up")

        arr = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        body = buf.getvalue()

        req = urllib.request.Request(
            f"{base}/v1/predict?format=npy", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            pred = np.load(io.BytesIO(r.read()))
        assert pred.shape == (40, 48)
        assert np.isfinite(pred).all()
        assert 0.0 <= pred.min() and pred.max() <= 1.0

        req = urllib.request.Request(
            f"{base}/v1/predict?format=png", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            png = Image.open(io.BytesIO(r.read()))
            assert png.size == (48, 40)

        # malformed body -> 400, wrong path -> 404
        bad = urllib.request.Request(
            f"{base}/v1/predict", data=b"not an image", method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # stats settle in the main loop shortly after the responses: poll
        import json as _json

        h = {}
        for _ in range(100):
            with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
                h = _json.loads(r.read())
            if h.get("served", 0) >= 2:
                break
            _time.sleep(0.1)
        assert h["ok"] and h["served"] >= 2, h
    finally:
        stop.set()
        t.join(timeout=60)
    assert not t.is_alive()


def _serve_free_port():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_serve_http_concurrent_requests_batch(depth_ckpt, tmp_path, rng):
    """Two same-shape HTTP requests arriving together must be grouped
    into ONE device batch (batch_images=2) and both get answers."""
    import io
    import threading
    import urllib.request

    from marigold_tpu.cli.serve import build_parser, serve

    watch = tmp_path / "watch"
    watch.mkdir()
    port = _serve_free_port()
    args = build_parser().parse_args([
        "--checkpoint", depth_ckpt,
        "--modality", "depth",
        "--watch_dir", str(watch),
        "--output_dir", str(tmp_path / "out"),
        "--batch_images", "2",
        "--ensemble_size", "1",
        "--denoise_steps", "1",
        "--processing_res", "32",
        "--poll_interval", "0.1",
        "--batch_wait", "30",  # a lone under-full request would sit out
        "--http_port", str(port),  # 30s; grouped ones dispatch immediately
        "--color_map", "None",
    ])
    stop = threading.Event()
    t = threading.Thread(target=serve, args=(args, stop), daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        import time as _time

        for _ in range(600):
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=5):
                    break
            except Exception:
                _time.sleep(0.1)
        else:
            raise AssertionError("http server never came up")

        def one(i, out):
            arr = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            req = urllib.request.Request(
                f"{base}/v1/predict", data=buf.getvalue(), method="POST"
            )
            with urllib.request.urlopen(req, timeout=180) as r:
                out[i] = np.load(io.BytesIO(r.read()))

        results = {}
        threads = [
            threading.Thread(target=one, args=(i, results)) for i in range(2)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(timeout=180)
        assert set(results) == {0, 1}
        for pred in results.values():
            assert pred.shape == (40, 48) and np.isfinite(pred).all()
        # grouped: one dispatched device batch served both requests
        # (stats settle in the main loop shortly after the responses)
        import json as _json

        h = {}
        for _ in range(100):
            with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
                h = _json.loads(r.read())
            if h.get("served") == 2:
                break
            _time.sleep(0.1)
        assert h["served"] == 2, h
        assert h["batches"] == 1, h
    finally:
        stop.set()
        t.join(timeout=60)


def test_serve_http_api_iid(tmp_path, rng):
    """HTTP serving for the IID modality: npz (all targets) and PNG
    (first target's visualization) response formats. Regression: the PNG
    path indexed MarigoldIIDOutput by integer, which raises KeyError and
    poisoned the whole batch."""
    import io
    import threading
    import urllib.request

    from fixtures import make_tiny_checkpoint
    from marigold_tpu.cli.serve import build_parser, serve

    ckpt = make_tiny_checkpoint(str(tmp_path / "ck"), mode="iid")
    watch = tmp_path / "watch"
    watch.mkdir()
    port = _serve_free_port()
    args = build_parser().parse_args([
        "--checkpoint", ckpt,
        "--modality", "iid",
        "--watch_dir", str(watch),
        "--output_dir", str(tmp_path / "out"),
        "--batch_images", "1",
        "--ensemble_size", "1",
        "--denoise_steps", "1",
        "--processing_res", "32",
        "--poll_interval", "0.1",
        "--batch_wait", "0.2",
        "--http_port", str(port),
        "--full_precision",
    ])
    stop = threading.Event()
    t = threading.Thread(target=serve, args=(args, stop), daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        import time as _time

        for _ in range(600):
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=5):
                    break
            except Exception:
                _time.sleep(0.1)
        else:
            raise AssertionError("http server never came up")

        arr = rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        body = buf.getvalue()

        req = urllib.request.Request(
            f"{base}/v1/predict?format=npy", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            assert r.status == 200
            z = np.load(io.BytesIO(r.read()))
            names = sorted(z.files)
        assert names  # one array per target
        for n in names:
            assert np.isfinite(z[n]).all()

        req = urllib.request.Request(
            f"{base}/v1/predict?format=png", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            assert r.status == 200
            png = Image.open(io.BytesIO(r.read()))
            assert png.size == (48, 40)
    finally:
        stop.set()
        t.join(timeout=60)


# ---------------- serve daemon hardening (long-lived process) ---------------- #


def test_scan_new_evicts_deleted(tmp_path):
    """`seen` and `read_failures` must not grow without bound: entries for
    files no longer in the watch dir are evicted; a recreated file counts
    as new work."""
    from marigold_tpu.cli.serve import _scan_new

    d = tmp_path / "w"
    d.mkdir()
    (d / "a.png").write_bytes(b"x")
    (d / "b.png").write_bytes(b"x")
    seen, rf = set(), {}
    assert len(_scan_new(str(d), seen, rf)) == 2
    assert len(seen) == 2

    rf[str(d / "a.png")] = [1, 0.0, 0.0]
    (d / "a.png").unlink()
    assert _scan_new(str(d), seen, rf) == []
    assert seen == {str(d / "b.png")}
    assert rf == {}

    (d / "a.png").write_bytes(b"x")
    assert _scan_new(str(d), seen, rf) == [str(d / "a.png")]


def test_sigterm_sets_drain_event():
    import signal
    import time as _time

    from marigold_tpu.cli.serve import _install_sigterm_drain

    old = signal.getsignal(signal.SIGTERM)
    try:
        stop = _install_sigterm_drain()
        assert stop is not None and not stop.is_set()
        os.kill(os.getpid(), signal.SIGTERM)
        for _ in range(200):
            if stop.is_set():
                break
            _time.sleep(0.01)
        assert stop.is_set()
    finally:
        signal.signal(signal.SIGTERM, old)


def test_serve_drain_on_stop(depth_ckpt, tmp_path, rng):
    """A stop request (SIGTERM / stop_event) drains accepted work: files
    sitting in an under-full bucket still run before the daemon exits."""
    import threading
    import time as _time
    import urllib.request

    from marigold_tpu.cli.serve import build_parser, serve

    watch = tmp_path / "watch"
    watch.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (40, 48, 3), dtype=np.uint8)
        ).save(watch / f"img{i}.png")
    port = _serve_free_port()
    args = build_parser().parse_args([
        "--checkpoint", depth_ckpt,
        "--modality", "depth",
        "--watch_dir", str(watch),
        "--output_dir", str(tmp_path / "out"),
        "--batch_images", "4",      # bucket stays under-full ...
        "--batch_wait", "600",      # ... and never times out on its own
        "--ensemble_size", "1",
        "--denoise_steps", "1",
        "--processing_res", "32",
        "--poll_interval", "0.1",
        "--http_port", str(port),
        "--color_map", "None",
    ])
    stop = threading.Event()
    rc_box = []
    t = threading.Thread(
        target=lambda: rc_box.append(serve(args, stop)), daemon=True
    )
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        # wait until both files are accepted into the bucket
        for _ in range(600):
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=5) as r:
                    if json.loads(r.read()).get("pending", 0) >= 2:
                        break
            except Exception:
                pass
            _time.sleep(0.1)
        else:
            raise AssertionError("files never accepted")
    finally:
        stop.set()
        t.join(timeout=180)
    assert not t.is_alive()
    assert rc_box == [0]
    out_npy = tmp_path / "out" / "depth_npy"
    assert sorted(os.listdir(out_npy)) == ["img0_pred.npy", "img1_pred.npy"]


def test_serve_http_oversized_body_413(depth_ckpt, tmp_path):
    """POST bodies over --http_max_body_mb are rejected with 413 before
    any buffering of the payload."""
    import threading
    import urllib.error
    import urllib.request

    from marigold_tpu.cli.serve import build_parser, serve

    watch = tmp_path / "watch"
    watch.mkdir()
    port = _serve_free_port()
    args = build_parser().parse_args([
        "--checkpoint", depth_ckpt,
        "--modality", "depth",
        "--watch_dir", str(watch),
        "--output_dir", str(tmp_path / "out"),
        "--batch_images", "1",
        "--ensemble_size", "1",
        "--denoise_steps", "1",
        "--processing_res", "32",
        "--poll_interval", "0.1",
        "--batch_wait", "0.2",
        "--http_port", str(port),
        "--http_max_body_mb", "1",
        "--color_map", "None",
    ])
    stop = threading.Event()
    t = threading.Thread(target=serve, args=(args, stop), daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        import time as _time

        for _ in range(600):
            try:
                with urllib.request.urlopen(f"{base}/healthz", timeout=5):
                    break
            except Exception:
                _time.sleep(0.1)
        else:
            raise AssertionError("http server never came up")
        big = b"\0" * (1024 * 1024 + 1)
        req = urllib.request.Request(
            f"{base}/v1/predict", data=big, method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=30)
            raise AssertionError("expected HTTPError 413")
        except urllib.error.HTTPError as e:
            assert e.code == 413
    finally:
        stop.set()
        t.join(timeout=60)
    assert not t.is_alive()
