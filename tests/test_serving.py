"""Serving layer: micro-batcher semantics + HTTP server end to end (tiny
model, real sockets)."""

import base64
import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from diffusynth_tpu.pipelines import DiffuSynthRuntime
from diffusynth_tpu.serving import MicroBatcher, make_server
from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
from tests.test_pipelines import tiny_config


class TestMicroBatcher:
    def test_coalesces_same_signature(self):
        calls = []

        def run_batch(sig, payloads):
            calls.append((sig, list(payloads)))
            time.sleep(0.05)
            return [p * 10 for p in payloads]

        b = MicroBatcher(run_batch, max_batch=8, window_ms=100)
        results = [None] * 4

        def worker(i):
            results[i] = b.submit(("w64",), i)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        b.stop()
        assert sorted(results) == [0, 10, 20, 30]
        # All four coalesced into at most 2 batches (typically 1).
        assert len(calls) <= 2
        assert sum(len(c[1]) for c in calls) == 4

    def test_different_signatures_not_merged(self):
        def run_batch(sig, payloads):
            assert len(set(payloads)) == len(payloads)
            return [(sig, p) for p in payloads]

        b = MicroBatcher(run_batch, max_batch=8, window_ms=20)
        r1 = b.submit(("a",), 1)
        r2 = b.submit(("b",), 2)
        b.stop()
        assert r1 == (("a",), 1)
        assert r2 == (("b",), 2)

    def test_error_propagates(self):
        def run_batch(sig, payloads):
            raise RuntimeError("boom")

        b = MicroBatcher(run_batch, window_ms=10)
        with pytest.raises(RuntimeError, match="boom"):
            b.submit(("x",), 1)
        b.stop()

    def test_submit_timeout(self):
        release = threading.Event()

        def run_batch(sig, payloads):
            release.wait(5.0)
            return payloads

        b = MicroBatcher(run_batch, window_ms=1)
        with pytest.raises(TimeoutError):
            b.submit(("x",), 1, timeout=0.1)
        release.set()
        b.stop()

    def test_stuck_detection_fails_fast(self):
        """A wedged batch (device fault, docs/SCAN_FAULT.md) must flip
        is_stuck() and make NEW submissions raise immediately instead of
        queuing behind the dead batch for their full timeout."""
        from diffusynth_tpu.serving.batcher import DeviceStuckError

        release = threading.Event()

        def run_batch(sig, payloads):
            release.wait(10.0)
            return payloads

        b = MicroBatcher(run_batch, window_ms=1, stuck_after_s=0.1)
        assert b.inflight_age_s() == 0.0 and not b.is_stuck()
        # The waiter exists to put a batch in flight; its own submission
        # completes once released (outcome asserted after join — an
        # in-thread pytest.raises failure would only warn, not fail).
        outcome = []
        waiter = threading.Thread(
            target=lambda: outcome.append(b.submit(("x",), 1, timeout=30.0)),
            daemon=True)
        waiter.start()
        deadline = time.monotonic() + 5.0
        while not b.is_stuck() and time.monotonic() < deadline:
            time.sleep(0.02)
        assert b.is_stuck() and b.inflight_age_s() > 0.1
        t0 = time.monotonic()
        with pytest.raises(DeviceStuckError):
            b.submit(("x",), 2, timeout=30.0)
        assert time.monotonic() - t0 < 1.0  # failed fast, not after timeout
        release.set()
        waiter.join(timeout=5.0)
        assert outcome == [1]  # the stuck batch itself completed on release
        # Recovered: the finished batch clears the in-flight marker.
        deadline = time.monotonic() + 5.0
        while b.is_stuck() and time.monotonic() < deadline:
            time.sleep(0.02)
        assert not b.is_stuck()
        b.stop()


@pytest.fixture(scope="module")
def server():
    runtime = DiffuSynthRuntime(
        tiny_config(), text_encoder=CachedTextEncoder(HashTextEncoder(16)))
    srv = make_server("127.0.0.1", 0, runtime=runtime, window_ms=20)
    port = srv.server_address[1]
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _post(url, path, body):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, json.loads(resp.read())


class TestHTTPServer:
    def test_health(self, server):
        with urllib.request.urlopen(server + "/health", timeout=30) as resp:
            body = json.loads(resp.read())
        assert body["status"] == "ok"

    def test_text2sound_endpoint(self, server):
        status, body = _post(server, "/v1/text2sound", {
            "prompt": "a tiny organ", "duration_sec": 1.0, "steps": 3,
            "cfg": 1.0, "seed": 4,
        })
        assert status == 200
        wav = base64.b64decode(body["audio_b64"])
        from scipy.io import wavfile

        sr, audio = wavfile.read(io.BytesIO(wav))
        assert sr == body["sample_rate"]
        assert len(audio) > 1000
        assert audio.dtype == np.int16  # standard PCM16, device-converted
        assert np.isfinite(audio.astype(np.float64)).all()

    def test_text2sound_dpmpp_sampler(self, server):
        """The sampler request field reaches the engine (dpmpp vs ddim at
        the same seed must differ; an ignored field would return the ddim
        result for both)."""
        def gen(sampler):
            status, body = _post(server, "/v1/text2sound", {
                "prompt": "a tiny organ", "duration_sec": 1.0, "steps": 4,
                "cfg": 1.0, "seed": 4, "sampler": sampler,
            })
            assert status == 200
            return base64.b64decode(body["audio_b64"])

        assert gen("dpmpp") != gen("ddim")
        assert gen("dpmpp") == gen("dpmpp")  # deterministic per seed

    def test_concurrent_requests_batch(self, server):
        results = [None] * 3

        def call(i):
            results[i] = _post(server, "/v1/text2sound", {
                "prompt": f"sound {i}", "duration_sec": 1.0, "steps": 3,
                "cfg": 1.0, "seed": i,
            })

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, body in results:
            assert status == 200
        # At least one response should report a merged batch.
        assert max(b["batch_size_executed"] for _, b in results) >= 2

    def test_mixed_cfg_and_negative_prompts_coalesce(self, server):
        """Requests differing ONLY in cfg scale and negative prompt must
        share one batched launch (per-sample traced guidance), and each
        must get its own guidance: different cfg at the same seed/prompt
        produces different audio."""
        reqs = [
            {"prompt": "a tiny organ", "duration_sec": 1.0, "steps": 3,
             "cfg": 2.0, "negative_prompt": "noise", "seed": 11},
            {"prompt": "a warm string", "duration_sec": 1.0, "steps": 3,
             "cfg": 6.0, "negative_prompt": "", "seed": 11},
            {"prompt": "a tiny organ", "duration_sec": 1.0, "steps": 3,
             "cfg": 9.0, "negative_prompt": "noise", "seed": 11},
        ]
        results = [None] * len(reqs)

        def call(i):
            results[i] = _post(server, "/v1/text2sound", reqs[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for status, _ in results:
            assert status == 200
        # Coalesced despite mixed cfg/negative prompts.
        assert max(b["batch_size_executed"] for _, b in results) >= 2
        # Per-sample guidance really applied: same prompt/seed, different
        # cfg -> different audio.
        a = base64.b64decode(results[0][1]["audio_b64"])
        c = base64.b64decode(results[2][1]["audio_b64"])
        assert a != c

    def test_mixed_cfg_matches_solo_run(self, server):
        """A request's audio must be identical whether it ran alone or
        coalesced into a mixed-cfg batch (guidance rows don't leak across
        samples)."""
        req = {"prompt": "a tiny organ", "duration_sec": 1.0, "steps": 3,
               "cfg": 2.0, "negative_prompt": "noise", "seed": 11}
        status, solo = _post(server, "/v1/text2sound", req)
        assert status == 200
        results = [None, None]
        other = {"prompt": "a warm string", "duration_sec": 1.0, "steps": 3,
                 "cfg": 7.5, "negative_prompt": "hum", "seed": 3}

        def call(i, body):
            results[i] = _post(server, "/v1/text2sound", body)

        threads = [threading.Thread(target=call, args=(0, req)),
                   threading.Thread(target=call, args=(1, other))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert results[0][0] == 200 and results[1][0] == 200
        from scipy.io import wavfile

        def decode(b):
            return wavfile.read(
                io.BytesIO(base64.b64decode(b["audio_b64"])))[1].astype(
                np.float32) / 32767.0

        got, ref = decode(results[0][1]), decode(solo)
        # Tight tolerance, not bitwise: the B=1 and B=2 programs may
        # differ in f32 reduction order.
        assert np.abs(got - ref).max() < 1e-3

    def test_sound2sound_coalesces(self, server):
        """Concurrent sound2sound requests sharing (width, steps,
        strength) merge into one img2img launch despite different
        prompts/cfg, and each gets valid audio."""
        from scipy.io import wavfile

        sr = 16000
        t = np.arange(sr) / sr
        wave = np.round(np.sin(2 * np.pi * 220 * t) * 20000).astype(np.int16)
        buf = io.BytesIO()
        wavfile.write(buf, sr, wave)
        audio_b64 = base64.b64encode(buf.getvalue()).decode()
        base_req = {"audio_b64": audio_b64, "duration_sec": 1.0,
                    "steps": 3, "noising_strength": 0.7}
        # Warm the encode + img2img programs so the concurrent pair's
        # submits land within one batching window.
        status, _ = _post(server, "/v1/sound2sound",
                          dict(base_req, prompt="warm", cfg=2.0, seed=0))
        assert status == 200
        reqs = [
            dict(base_req, prompt="an organ", cfg=2.0, seed=1),
            dict(base_req, prompt="a flute", cfg=6.0,
                 negative_prompt="hum", seed=2),
        ]
        results = [None, None]

        def call(i):
            results[i] = _post(server, "/v1/sound2sound", reqs[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(reqs))]
        for t_ in threads:
            t_.start()
        for t_ in threads:
            t_.join()
        for status, body in results:
            assert status == 200
            out = wavfile.read(
                io.BytesIO(base64.b64decode(body["audio_b64"])))[1]
            assert np.isfinite(out.astype(np.float64)).all()
        assert max(b["batch_size_executed"] for _, b in results) >= 2
        assert (results[0][1]["audio_b64"] != results[1][1]["audio_b64"])

    def test_batchsize_variations(self, server):
        """batchsize=k expands into k coalesced rows (seed+i each) and
        returns k distinct audios; row i matches a solo run with seed+i."""
        from scipy.io import wavfile

        req = {"prompt": "a small bell", "duration_sec": 1.0, "steps": 3,
               "cfg": 2.0, "seed": 7, "batchsize": 3}
        status, body = _post(server, "/v1/text2sound", req)
        assert status == 200
        assert body["batchsize"] == 3 and len(body["results"]) == 3
        clips = []
        for r in body["results"]:
            out = wavfile.read(
                io.BytesIO(base64.b64decode(r["audio_b64"])))[1]
            assert np.isfinite(out.astype(np.float64)).all()
            assert r["batch_size_executed"] >= 3
            clips.append(out.astype(np.float32) / 32767.0)
        assert not np.array_equal(clips[0], clips[1])
        assert not np.array_equal(clips[1], clips[2])
        # Row 1 used seed 8: a solo seed-8 request must match (tight, not
        # bitwise — different batch sizes reorder f32 reductions).
        status, solo = _post(server, "/v1/text2sound",
                             dict(req, seed=8, batchsize=1))
        assert status == 200
        ref = wavfile.read(
            io.BytesIO(base64.b64decode(solo["audio_b64"])))[1].astype(
            np.float32) / 32767.0
        assert np.abs(clips[1] - ref).max() < 1e-3

    def test_inpaint_endpoint_coalesces(self, server):
        """Concurrent inpaint requests with DIFFERENT mask rectangles and
        inpaint areas merge into one launch (masks are per-sample rows),
        and each returns valid audio."""
        from scipy.io import wavfile

        sr = 16000
        t = np.arange(sr) / sr
        wave = np.round(np.sin(2 * np.pi * 330 * t) * 20000).astype(np.int16)
        buf = io.BytesIO()
        wavfile.write(buf, sr, wave)
        audio_b64 = base64.b64encode(buf.getvalue()).decode()
        base_req = {"audio_b64": audio_b64, "duration_sec": 1.0, "steps": 3,
                    "mask_time_begin": 0.2, "mask_time_end": 0.8,
                    "mask_frequency_begin": 0, "mask_frequency_end": 512}
        status, _ = _post(server, "/v1/inpaint",
                          dict(base_req, prompt="warm", cfg=2.0, seed=0))
        assert status == 200
        reqs = [
            dict(base_req, prompt="an organ", cfg=2.0, seed=1,
                 inpaint_area="masked"),
            dict(base_req, prompt="a bell", cfg=6.0, negative_prompt="hum",
                 seed=2, inpaint_area="unmasked", mask_time_begin=0.0,
                 mask_time_end=0.4),
        ]
        results = [None, None]

        def call(i):
            results[i] = _post(server, "/v1/inpaint", reqs[i])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(len(reqs))]
        for t_ in threads:
            t_.start()
        for t_ in threads:
            t_.join()
        for status, body in results:
            assert status == 200
            out = wavfile.read(
                io.BytesIO(base64.b64decode(body["audio_b64"])))[1]
            assert np.isfinite(out.astype(np.float64)).all()
        assert max(b["batch_size_executed"] for _, b in results) >= 2
        assert (results[0][1]["audio_b64"] != results[1][1]["audio_b64"])

    def test_track_endpoint(self, server, tmp_path):
        from diffusynth_tpu.midi.parser import write_midi

        path = str(tmp_path / "t.mid")
        write_midi(path, [(52, 100, 0, 2880), (59, 100, 2880, 2880)])
        status, body = _post(server, "/v1/track", {
            "midi_b64": base64.b64encode(open(path, "rb").read()).decode(),
            "instrument": "preset_organ", "sample_steps": 3, "max_notes": 4,
        })
        assert status == 200
        assert body["duration_sec"] > 5

    def test_batch_padding_buckets(self, server):
        """3 concurrent requests pad to the 4-bucket (stable program sizes);
        under a DP mesh the buckets grow to multiples of the device count
        so the batch axis shards evenly (serving/server.py::pad_bucket)."""
        from diffusynth_tpu.serving.server import pad_bucket

        assert pad_bucket(1) == 1
        assert pad_bucket(3) == 4
        assert pad_bucket(9) == 16
        assert pad_bucket(17) == 17
        # mesh-aware: divisible by the device count
        assert pad_bucket(1, devices=8) == 8
        assert pad_bucket(3, devices=4) == 4
        assert pad_bucket(9, devices=8) == 16
        assert pad_bucket(17, devices=8) == 24

    def test_bad_request(self, server):
        try:
            _post(server, "/v1/text2sound", {"no_prompt": True})
            raise AssertionError("expected HTTPError")
        except urllib.error.HTTPError as e:
            assert e.code in (400, 500)

    def test_unknown_route(self, server):
        try:
            _post(server, "/v1/nope", {})
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404


class TestServingHardening:
    def test_priority_skips_window(self):
        """priority>0 requests execute without waiting out the window."""
        def run_batch(sig, payloads):
            return list(payloads)

        b = MicroBatcher(run_batch, max_batch=8, window_ms=5000)
        t0 = time.monotonic()
        b.submit(("w",), 1, priority=1)
        assert time.monotonic() - t0 < 2.0
        b.stop()

    def test_metrics_endpoint(self, server):
        _post(server, "/v1/text2sound", {
            "prompt": "metric probe", "duration_sec": 1.0, "steps": 2,
            "cfg": 1.0, "seed": 0})
        with urllib.request.urlopen(server + "/v1/metrics",
                                    timeout=30) as resp:
            body = json.loads(resp.read())
        assert body["requests_served"] >= 1
        assert "/v1/text2sound" in body["endpoints"]
        ep = body["endpoints"]["/v1/text2sound"]
        assert ep["count"] >= 1 and ep["p50_s"] > 0
        assert sum(body["batch_size_histogram"].values()) >= 1
        assert body["batch_queue_wait"]["count"] >= 1

    def test_health_reports_inflight_age_and_stuck(self, server):
        """/health must expose the in-flight batch age and flip to
        "stuck" past the batcher threshold (wedge detection for
        orchestrators; docs/SCAN_FAULT.md)."""
        with urllib.request.urlopen(server + "/health", timeout=30) as resp:
            body = json.loads(resp.read())
        assert body["status"] == "ok"
        assert body["inflight_batch_age_s"] == 0.0

    def test_warmup_manifest(self, server, tmp_path):
        manifest = tmp_path / "warm.json"
        manifest.write_text(json.dumps(
            [{"widths": [16], "steps": 2, "cfg": 1.0, "batch_sizes": [1]}]))
        # Exercise via the endpoint (same code path as --warmup-manifest).
        status, body = _post(server, "/v1/warmup", {
            "widths": [16], "steps": 2, "cfg": 1.0, "batch_sizes": [1, 2]})
        assert status == 200
        assert {"task": "t2s", "width": 16, "batch": 1} in body["compiled"]
        assert {"task": "t2s", "width": 16, "batch": 2} in body["compiled"]

    def test_warmup_guided_tasks(self, server):
        """Warmup precompiles sound2sound and inpaint programs too (zero
        guide latent / mask at the manifest's noising_strength)."""
        status, body = _post(server, "/v1/warmup", {
            "widths": [16], "steps": 2, "cfg": 1.0, "batch_sizes": [1],
            "tasks": ["s2s", "inp"], "noising_strength": 0.5})
        assert status == 200
        assert {"task": "s2s", "width": 16, "batch": 1} in body["compiled"]
        assert {"task": "inp", "width": 16, "batch": 1} in body["compiled"]


def test_warmup_manifest_default_keyword():
    """--warmup-manifest default resolves the built-in serving-default
    manifest (no file read) and feeds every entry to warmup (VERDICT r3 #4:
    boot pre-warm so the first request never pays a compile)."""
    from diffusynth_tpu.serving.server import DiffuSynthServer

    seen = []
    srv = object.__new__(DiffuSynthServer)   # no runtime/model init needed
    srv.warmup = seen.append
    DiffuSynthServer.warmup_from_manifest(srv, "default")
    assert seen == DiffuSynthServer.DEFAULT_MANIFEST
    entry = seen[0]
    assert set(entry["tasks"]) == {"t2s", "s2s", "inp"}
    assert entry["widths"] == [64] and 1 in entry["batch_sizes"]


def test_build_runtime_from_checkpoint(tmp_path):
    """The serving CLI's --checkpoint/--use-ema/--lora-name wiring: weights
    load through from_pretrained; all-defaults returns None (make_server
    then builds its own default runtime)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusynth_tpu.pipelines import DiffuSynthRuntime
    from diffusynth_tpu.serving.server import build_runtime
    from diffusynth_tpu.train.checkpoints import Checkpointer

    assert build_runtime() is None

    enc = CachedTextEncoder(HashTextEncoder(16))
    rt1 = DiffuSynthRuntime(tiny_config(), text_encoder=enc, seed=3)
    models_dir = str(tmp_path / "models")
    ckpt = Checkpointer(models_dir)
    ckpt.save("vqgan", "imageVQVAE",
              {"variables": rt1.vqgan_variables, "step": 1})
    ckpt.save("unet", "UNet", {"variables": rt1.unet_variables, "step": 1})

    rt2 = build_runtime(checkpoint=models_dir, config=tiny_config())
    a = jax.tree_util.tree_leaves(rt1.unet_variables)[0]
    b = jax.tree_util.tree_leaves(rt2.unet_variables)[0]
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-7)


def test_build_runtime_rejects_roles_without_checkpoint():
    """--use-ema/--lora-name without --checkpoint would silently serve
    random weights (r2 advisor finding) — must raise instead."""
    import pytest

    from diffusynth_tpu.serving.server import build_runtime

    with pytest.raises(ValueError, match="require --checkpoint"):
        build_runtime(use_ema=True)
    with pytest.raises(ValueError, match="require --checkpoint"):
        build_runtime(lora_name="ft")
