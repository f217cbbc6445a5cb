"""Dependency-free HTTP inference server.

Endpoints (JSON in, JSON out; audio as base64 WAV):

  GET  /health                    liveness + batcher stats
  POST /v1/warmup                 {"widths": [64], "steps": 20, "cfg": 6.0}
  POST /v1/text2sound             {"prompt": ..., "negative_prompt": "",
                                   "duration_sec": 3.0, "steps": 20,
                                   "cfg": 6.0, "sampler": "ddim", "seed": 0}
                                  (sampler: ddim | ddpm | dpmpp)
  POST /v1/sound2sound            {"audio_b64": ..., "sample_rate": 16000,
                                   "prompt": ..., "noising_strength": 0.7, ...}
  POST /v1/inpaint                {"audio_b64": ..., "prompt": ...,
                                   "mask_time_begin": 0.5, "mask_time_end": 1.5,
                                   "mask_frequency_begin": 0,
                                   "mask_frequency_end": 512,
                                   "inpaint_area": "masked", ...}
                                  (frequency bounds in spectrogram bins,
                                   like the UI sliders; the rectangle is
                                   repainted when inpaint_area="masked",
                                   preserved — and everything else
                                   repainted — when "unmasked"; reference
                                   inpaint_with_text.py:204-233 semantics)
  POST /v1/track                  {"midi_b64": ..., "instrument":
                                   "preset_organ", "sample_steps": 10,
                                   "max_notes": 100}

text2sound, sound2sound, and inpaint requests are coalesced by the
micro-batcher: same (task, width, steps, cfg-on/off, sampler
[+ noising_strength for the guided tasks]) requests within the batching
window run as ONE batched device launch, each with its own deterministic
per-seed noise. Different prompts, negative prompts, cfg scales, AND
inpaint masks all batch together — conditions, img2img guide latents,
and masks are per-sample rows and the guidance scale is a traced (B,)
input of the compiled loop (diffusion/sampler.py), so mixed-request
batches share one program with no recompile.

Run: python -m diffusynth_tpu.serving.server --port 8600
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diffusynth_tpu.configs import AppConfig, bucket_width
from diffusynth_tpu.diffusion.schedule import respaced_timesteps
from diffusynth_tpu.pipelines import (
    DiffuSynthRuntime,
    Sound2SoundPipeline,
    TrackRenderPipeline,
)
from diffusynth_tpu.pipelines.track_render import InstrumentConfig
from diffusynth_tpu.serving.batcher import DeviceStuckError, MicroBatcher
from diffusynth_tpu.serving.metrics import Metrics


def pad_bucket(n: int, devices: int = 1) -> int:
    """Round a merged batch up to a fixed size bucket so every batch size
    reuses a compiled program (a fresh size = a multi-minute recompile
    through the remote compiler). Under a DP mesh, buckets must also be
    divisible by the device count so the batch axis shards evenly — on a
    v5e-8 the buckets become {8, 16} and a single request executes as one
    row per chip (same per-chip latency as b1 single-chip)."""
    for b in (1, 2, 4, 8, 16):
        if n <= b and b % devices == 0:
            return b
    return -(-n // devices) * devices


def _wav_b64(audio: np.ndarray, sample_rate: int) -> str:
    """Standard PCM16 WAV, base64-encoded.

    int16 input (device-converted, pipelines audio_format="int16") passes
    through untouched; float input is converted here exactly like the
    native writer (clip [-1,1], round-half-even * 32767).
    """
    from scipy.io import wavfile

    audio = np.asarray(audio)
    if audio.dtype != np.int16:
        audio = np.round(
            np.clip(audio.astype(np.float32), -1.0, 1.0) * 32767.0
        ).astype(np.int16)
    buf = io.BytesIO()
    wavfile.write(buf, sample_rate, audio)
    return base64.b64encode(buf.getvalue()).decode()


class DiffuSynthServer:
    def __init__(self, runtime: Optional[DiffuSynthRuntime] = None,
                 max_batch: int = 16, window_ms: float = 30.0,
                 request_timeout_s: float = 900.0):
        # request_timeout_s matches the batcher's stuck threshold by
        # default: a COLD first request legitimately sits behind a
        # multi-minute remote compile (240-460 s measured through the
        # axon tunnel, benchmarks/RESULTS_r2.md), so a 300 s cap would
        # 504 requests the device is actively serving. Deployments with
        # warmup manifests can lower both.
        self.request_timeout_s = request_timeout_s
        self.runtime = runtime or DiffuSynthRuntime(AppConfig())
        self.s2s = Sound2SoundPipeline(self.runtime)
        self.track = TrackRenderPipeline(self.runtime)
        self._samplers: Dict[Tuple, Any] = {}
        self._lock = threading.Lock()
        self._gen_lock = threading.Lock()
        self.batcher = MicroBatcher(self._run_batch,
                                    max_batch=max_batch, window_ms=window_ms)
        self.metrics = Metrics()
        self.batcher.metrics = self.metrics
        self._instruments = None

    # -- text2sound batching --------------------------------------------------

    def _sampler_for(self, steps: int, cfg_on: bool):
        """One sampler per (steps, cfg-on/off); guidance scales and
        negative-prompt embeddings are per-batch traced inputs, activated
        in _run_text2sound_batch under _gen_lock."""
        key = (steps, cfg_on)
        with self._lock:
            if key not in self._samplers:
                s = self.runtime.make_sampler()
                s.respace(list(respaced_timesteps(
                    self.runtime.config.diffusion.timesteps, steps)))
                self._samplers[key] = s
            return self._samplers[key]

    def _pad_batch(self, n: int) -> int:
        """Bucket the merged batch (see pad_bucket); mesh-aware so sharded
        serving launches always divide evenly over the DP axis."""
        mesh = self.runtime.mesh
        return pad_bucket(n, 1 if mesh is None else int(mesh.devices.size))

    def _run_batch(self, signature: Tuple, payloads: List[Dict]):
        """Batcher callback: signatures are namespaced by task family so
        one batcher (and one device queue) serves every generation kind."""
        if signature[0] == "s2s":
            return self._run_sound2sound_batch(signature[1:], payloads)
        if signature[0] == "inp":
            return self._run_inpaint_batch(signature[1:], payloads)
        return self._run_text2sound_batch(signature[1:], payloads)

    def _seed_templates(self, payloads: List[Dict]):
        """Per-request deterministic noise templates from per-request
        seeds (one train-width template row per request; the sampler's
        repeat strategy widens them)."""
        d = self.runtime.config.diffusion
        templates = [
            jax.random.normal(jax.random.key(int(p.get("seed", 0))),
                              (1, d.height, d.train_width, d.channels))
            for p in payloads
        ]
        return jnp.concatenate(templates, axis=0)

    def _activate_cfg(self, s, payloads: List[Dict]):
        """Per-sample guidance: (B,) cfg scales + (B, D) negative-prompt
        embeddings (both traced — no recompile across values)."""
        uncond = jnp.asarray(self.runtime.encode_text(
            [str(p.get("negative_prompt", "")) for p in payloads]))
        scales = jnp.asarray(
            [float(p.get("cfg", 6.0)) for p in payloads], jnp.float32)
        s.activate_classifier_free_guidance(scales, uncond)

    def _run_text2sound_batch(self, signature: Tuple, payloads: List[Dict]):
        width, steps, cfg_on, sampler_name = signature
        rt = self.runtime
        a = rt.config.audio
        n = len(payloads)
        B = self._pad_batch(n)
        padded = list(payloads) + [payloads[-1]] * (B - n)
        d = rt.config.diffusion

        cond = jnp.asarray(rt.encode_text([p["prompt"] for p in padded]))
        template = self._seed_templates(padded)

        s = self._sampler_for(steps, cfg_on)
        shape = (B, d.height, width, d.channels)
        # activate + sample must be atomic: the batcher thread and direct
        # warmup calls share the sampler object.
        with self._gen_lock:
            if cfg_on:
                self._activate_cfg(s, padded)
            latents, _ = s.sample(rt.unet_variables, shape,
                                  jax.random.key(0), condition=cond,
                                  sampler=sampler_name,
                                  initial_noise=template)
        # int16 on device: same PCM16 bytes the WAV writer would produce,
        # at half the device->host transfer.
        _, _, audio = rt.decode_latents_full(latents, quantize=True,
                                             audio_format="int16")
        audio = np.asarray(audio)
        return [
            {"audio_b64": _wav_b64(audio[i], a.sample_rate),
             "sample_rate": a.sample_rate,
             "batch_size_executed": B}
            for i in range(n)
        ]

    def _run_sound2sound_batch(self, signature: Tuple, payloads: List[Dict]):
        """Merged img2img launch: per-sample guide latents, prompts,
        negative prompts, cfg scales, and seed noise in one program.
        noising_strength must match within a batch (it sets the static
        start index of the denoising chain)."""
        width, steps, strength, cfg_on, sampler_name = signature
        rt = self.runtime
        a = rt.config.audio
        n = len(payloads)
        B = self._pad_batch(n)
        padded = list(payloads) + [payloads[-1]] * (B - n)
        d = rt.config.diffusion

        cond = jnp.asarray(rt.encode_text([p["prompt"] for p in padded]))
        template = self._seed_templates(padded)
        guide = jnp.concatenate([p["zq"] for p in padded], axis=0)

        # Steps normalization (reference: sound2sound_with_text.py:185).
        normalized_steps = max(1, int(steps / strength))
        s = self._sampler_for(normalized_steps, cfg_on)
        shape = (B, d.height, width, d.channels)
        with self._gen_lock:
            if cfg_on:
                self._activate_cfg(s, padded)
            latents, _ = s.img_guided_sample(
                rt.unet_variables, shape, jax.random.key(0),
                noising_strength=strength, guide_img=guide, condition=cond,
                sampler=sampler_name, initial_noise=template)
        _, _, audio = rt.decode_latents_full(latents, quantize=True,
                                             audio_format="int16")
        audio = np.asarray(audio)
        return [
            {"audio_b64": _wav_b64(audio[i], a.sample_rate),
             "sample_rate": a.sample_rate,
             "batch_size_executed": B}
            for i in range(n)
        ]

    def _run_inpaint_batch(self, signature: Tuple, payloads: List[Dict]):
        """Merged masked-resampling launch: per-sample guide latents AND
        per-sample (H, W, 1) keep-masks are batch rows of one program
        (the mask is a traced input of the loop body,
        diffusion/sampler.py inpaint blending)."""
        width, steps, strength, cfg_on, sampler_name = signature
        rt = self.runtime
        a = rt.config.audio
        n = len(payloads)
        B = self._pad_batch(n)
        padded = list(payloads) + [payloads[-1]] * (B - n)
        d = rt.config.diffusion

        cond = jnp.asarray(rt.encode_text([p["prompt"] for p in padded]))
        template = self._seed_templates(padded)
        guide = jnp.concatenate([p["zq"] for p in padded], axis=0)
        mask = jnp.asarray(
            np.stack([p["mask"] for p in padded])[:, :, :, None], jnp.float32)

        normalized_steps = max(1, int(steps / strength))
        s = self._sampler_for(normalized_steps, cfg_on)
        shape = (B, d.height, width, d.channels)
        with self._gen_lock:
            if cfg_on:
                self._activate_cfg(s, padded)
            latents, _ = s.inpaint_sample(
                rt.unet_variables, shape, jax.random.key(0),
                noising_strength=strength, guide_img=guide, mask=mask,
                condition=cond, sampler=sampler_name,
                initial_noise=template)
        _, _, audio = rt.decode_latents_full(latents, quantize=True,
                                             audio_format="int16")
        audio = np.asarray(audio)
        return [
            {"audio_b64": _wav_b64(audio[i], a.sample_rate),
             "sample_rate": a.sample_rate,
             "batch_size_executed": B}
            for i in range(n)
        ]

    def _submit_expanded(self, signature: Tuple, payload: Dict,
                         body: Dict) -> Dict:
        """Submit a request, expanding batchsize-N into N batcher rows
        (row i uses seed+i — the reference UI's variations slider,
        gradio_webUI.py:68-69). Rows coalesce with each other and with
        concurrent traffic; N=1 keeps the single-result response shape."""
        k = max(1, int(body.get("batchsize", 1)))
        prio = int(body.get("priority", 0))
        if k == 1:
            return self.batcher.submit(signature, payload,
                                       timeout=self.request_timeout_s,
                                       priority=prio)
        seed = int(body.get("seed", 0))
        rows = [dict(payload, seed=seed + i) for i in range(k)]
        results = self.batcher.submit_many(signature, rows,
                                           timeout=self.request_timeout_s,
                                           priority=prio)
        return {"results": results, "batchsize": k,
                "sample_rate": results[0]["sample_rate"]}

    # -- request handlers ------------------------------------------------------

    def text2sound(self, body: Dict) -> Dict:
        a = self.runtime.config.audio
        width = bucket_width(
            a.width_from_duration(float(body.get("duration_sec", 3.0))))
        # cfg value and negative prompt are per-sample traced inputs —
        # only cfg on/off changes the program, so mixed-prompt/mixed-cfg
        # traffic coalesces into one batch.
        signature = (
            "t2s",
            width,
            int(body.get("steps", 20)),
            float(body.get("cfg", 6.0)) != 1.0,
            str(body.get("sampler", "ddim")),
        )
        return self._submit_expanded(signature, body, body)

    def _encode_upload(self, body: Dict) -> jnp.ndarray:
        """Decode the request's base64 WAV and encode it to a (1, H, W, C)
        guide latent (one small device launch, outside the batcher)."""
        from scipy.io import wavfile

        raw = base64.b64decode(body["audio_b64"])
        sr, wave = wavfile.read(io.BytesIO(raw))
        wave = np.asarray(wave, np.float32)
        if wave.ndim == 2:
            wave = wave.mean(axis=1)
        if np.abs(wave).max() > 2.0:
            wave = wave / 32768.0
        _, _, zq = self.s2s.encode_origin_audio(
            wave, int(sr), float(body.get("duration_sec", 3.0)))
        return zq

    def sound2sound(self, body: Dict) -> Dict:
        # Encode up front, then submit the guide latent to the batcher:
        # concurrent s2s requests sharing (width, steps, strength,
        # cfg-on/off, sampler) merge into one img2img launch, prompts/cfg
        # per-sample like text2sound.
        zq = self._encode_upload(body)
        signature = (
            "s2s",
            int(zq.shape[2]),
            int(body.get("steps", 20)),
            float(body.get("noising_strength", 0.7)),
            float(body.get("cfg", 6.0)) != 1.0,
            str(body.get("sampler", "ddim")),
        )
        payload = dict(body)
        payload["zq"] = zq
        return self._submit_expanded(signature, payload, body)

    def inpaint(self, body: Dict) -> Dict:
        from diffusynth_tpu.pipelines.inpaint import build_latent_mask

        zq = self._encode_upload(body)
        a = self.runtime.config.audio
        # Slider-rectangle mask in UI coordinates (seconds / spectrogram
        # frequency bins), built host-side per request; per-sample masks
        # are batch rows of the merged launch.
        mask = build_latent_mask(
            a.latent_height, int(zq.shape[2]), a.vae_scale,
            a.time_resolution,
            mask_time_begin=float(body.get("mask_time_begin", 0.0)),
            mask_time_end=float(body.get("mask_time_end", 0.0)),
            mask_frequency_begin=int(body.get("mask_frequency_begin", 0))
            // a.vae_scale,
            mask_frequency_end=int(body.get("mask_frequency_end", 0))
            // a.vae_scale,
            inpaint_area=str(body.get("inpaint_area", "masked")),
        )
        signature = (
            "inp",
            int(zq.shape[2]),
            int(body.get("steps", 20)),
            float(body.get("noising_strength", 1.0)),
            float(body.get("cfg", 6.0)) != 1.0,
            str(body.get("sampler", "ddim")),
        )
        payload = dict(body)
        payload["zq"] = zq
        payload["mask"] = mask
        return self._submit_expanded(signature, payload, body)

    def render_track(self, body: Dict) -> Dict:
        from diffusynth_tpu.midi import MidiFile

        if self._instruments is None:
            from diffusynth_tpu.ui.presets import load_presets

            self._instruments, _ = load_presets(self.runtime)
        name = body.get("instrument", "preset_organ")
        inst = self._instruments[name]
        cfg = InstrumentConfig(
            latent=inst["latent_representation"],
            sample_steps=int(body.get("sample_steps", 10)),
        )
        mid = MidiFile.from_bytes(base64.b64decode(body["midi_b64"]))
        audio = self.track.render(
            mid, {name: cfg}, [name] * len(mid.tracks),
            max_notes=int(body.get("max_notes", 100)),
        )
        peak = np.abs(audio).max()
        if peak > 0:
            audio = audio / peak
        sr = self.runtime.config.audio.sample_rate
        return {"audio_b64": _wav_b64(audio, sr), "sample_rate": sr,
                "duration_sec": len(audio) / sr}

    def warmup(self, body: Dict) -> Dict:
        """Precompile programs for the given (task, width, batch-size)
        buckets (a fresh merged-batch size is otherwise a multi-minute
        recompile through the remote compiler). tasks: any of
        "t2s" (default), "s2s", "inp"; the guided tasks warm with a
        zero guide latent/mask at the manifest's noising_strength."""
        widths = body.get("widths", [64])
        steps = int(body.get("steps", 20))
        cfg = float(body.get("cfg", 6.0))
        sampler = str(body.get("sampler", "ddim"))
        tasks = [str(t) for t in body.get("tasks", ["t2s"])]
        batch_sizes = [int(b) for b in body.get("batch_sizes", [1])]
        d = self.runtime.config.diffusion
        a = self.runtime.config.audio
        compiled = []
        for task in tasks:
            strength = float(body.get(
                "noising_strength", 1.0 if task == "inp" else 0.7))
            for w in widths:
                w = int(w)
                for b in batch_sizes:
                    rows = [{"prompt": "warmup", "seed": i, "cfg": cfg}
                            for i in range(b)]
                    if task == "t2s":
                        sig = ("t2s", w, steps, cfg != 1.0, sampler)
                    else:
                        zq = jnp.zeros((1, d.height, w, d.channels))
                        for row in rows:
                            row["zq"] = zq
                        if task == "inp":
                            for row in rows:
                                row["mask"] = np.zeros(
                                    (a.latent_height, w), np.float32)
                        sig = (task, w, steps, strength, cfg != 1.0, sampler)
                    self._run_batch(sig, rows)
                    compiled.append({"task": task, "width": w, "batch": b})
            if task in ("s2s", "inp"):
                # Warm the upload-encode program too: _encode_upload runs
                # OUTSIDE the batcher, so without this the first real
                # guided request still paid its encode compile (measured
                # +3.5 s over steady state, RESULTS_r4.md section 5).
                for w in widths:
                    # Inverse of width_from_duration (configs.py:49-51).
                    dur = 4.0 * int(w) * a.vae_scale / a.time_resolution - 1.0
                    t = np.arange(a.sample_rate) / a.sample_rate
                    wave = np.sin(2 * np.pi * 220 * t).astype(np.float32)
                    self.s2s.encode_origin_audio(wave, a.sample_rate, dur)
        return {"compiled": compiled}

    # The built-in "default" manifest covers the serving defaults (width 64,
    # 20 steps, CFG on) for every generation task at the coalesced-batch
    # buckets a light traffic mix actually hits (1 and 8; _pad_batch rounds
    # merged batches to {1,2,4,8,16}). All of these programs go through the
    # AOT executable cache, so on a warm cache this is ~10 loads of 1-2 s
    # each instead of multi-minute compiles (VERDICT r3 task #4).
    DEFAULT_MANIFEST = [{"tasks": ["t2s", "s2s", "inp"], "widths": [64],
                         "steps": 20, "cfg": 6.0, "batch_sizes": [1, 8]}]

    def warmup_from_manifest(self, path: str) -> None:
        """Precompile every entry of a JSON warmup manifest at startup:
        [{"widths": [64, 96], "steps": 20, "cfg": 6.0,
          "batch_sizes": [1, 4]}, ...]. path="default" uses
        DEFAULT_MANIFEST (the serving-default shapes)."""
        if path == "default":
            entries = self.DEFAULT_MANIFEST
        else:
            with open(path) as f:
                entries = json.load(f)
        t0 = time.time()
        for entry in entries:
            print(f"[serve] warmup {entry}", flush=True)
            self.warmup(entry)
        print(f"[serve] warmup done in {time.time() - t0:.1f}s "
              f"(server starts accepting traffic now)", flush=True)

    def health(self) -> Dict:
        """Liveness + wedge detection: a batch executing longer than the
        batcher's stuck threshold flips status to "stuck" (the axon
        backend's known failure mode is a server-side compile that blocks
        every client, docs/SCAN_FAULT.md — orchestrators should restart)."""
        stuck = self.batcher.is_stuck()
        return {
            "status": "stuck" if stuck else "ok",
            "backend": jax.default_backend(),
            "batches_run": self.batcher.batches_run,
            "requests_served": self.batcher.requests_served,
            "inflight_batch_age_s": round(self.batcher.inflight_age_s(), 3),
        }

    def metrics_snapshot(self) -> Dict:
        snap = self.metrics.snapshot()
        snap["batches_run"] = self.batcher.batches_run
        snap["requests_served"] = self.batcher.requests_served
        snap["compiled_samplers"] = len(self._samplers)
        return snap


def make_server(host: str = "127.0.0.1", port: int = 8600,
                runtime: Optional[DiffuSynthRuntime] = None,
                **kwargs) -> ThreadingHTTPServer:
    app = DiffuSynthServer(runtime=runtime, **kwargs)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj: Dict):
            data = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, app.health())
            elif self.path == "/v1/metrics":
                self._send(200, app.metrics_snapshot())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length) or b"{}")
            except json.JSONDecodeError:
                self._send(400, {"error": "invalid JSON body"})
                return
            routes = {
                "/v1/text2sound": app.text2sound,
                "/v1/sound2sound": app.sound2sound,
                "/v1/inpaint": app.inpaint,
                "/v1/track": app.render_track,
                "/v1/warmup": app.warmup,
            }
            fn = routes.get(self.path)
            if fn is None:
                self._send(404, {"error": "not found"})
                return
            try:
                with app.metrics.time_endpoint(self.path):
                    result = fn(body)
                self._send(200, result)
            except (KeyError, ValueError) as e:
                self._send(400, {"error": f"bad request: {e}"})
            except DeviceStuckError as e:
                # Device presumed wedged: fail fast, tell clients to back
                # off until an orchestrator restarts the server.
                self._send(503, {"error": f"device stuck: {e}"})
            except TimeoutError as e:
                self._send(504, {"error": f"generation timed out: {e}"})
            except Exception as e:  # noqa: BLE001 - surface to client
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet access log
            print(f"[serve] {self.address_string()} {fmt % args}",
                  file=sys.stderr)

    server = ThreadingHTTPServer((host, port), Handler)
    server.app = app  # type: ignore[attr-defined]
    return server


def build_runtime(checkpoint=None, quantize=None, use_ema=False,
                  lora_name=None, config=None, mesh="auto"):
    """Construct the serving runtime from CLI-level options.

    checkpoint: orbax models dir (from compat.convert_cli or train.run) —
    weights load via DiffuSynthRuntime.from_pretrained (use_ema prefers
    the UNet_ema role; lora_name bakes a UNet_lora adapter in at load
    time). None = random weights (smoke/serving-bench mode). quantize
    ("int8") applies the W8A8 U-Net conv path either way.

    mesh: "auto" (default) builds a DP mesh over ALL visible devices when
    more than one is present — on a v5e-8 the server shards every
    coalesced batch over ICI out of the box (VERDICT r4 task 1; the
    rebuild's north star, SURVEY.md §2.3 / BASELINE.md). "off" pins one
    chip; an integer string meshes over that many devices. Returns None
    when every option is default AND no mesh is wanted, so make_server
    builds its own default runtime (keeps the no-args single-chip path
    identical to before).
    """
    mesh_obj = None
    if mesh == "auto":
        if jax.device_count() > 1:
            from diffusynth_tpu.parallel.mesh import make_mesh

            mesh_obj = make_mesh()
    elif mesh not in (None, "off"):
        from diffusynth_tpu.parallel.mesh import make_mesh

        mesh_obj = make_mesh(int(mesh))
    if mesh_obj is not None:
        print(f"[serve] DP mesh over {mesh_obj.devices.size} devices "
              f"({mesh_obj.axis_names[0]} axis); coalesced batches shard "
              f"over ICI", flush=True)
    if not (checkpoint or quantize or use_ema or lora_name
            or mesh_obj is not None):
        return None
    if (use_ema or lora_name) and not checkpoint:
        # Without --checkpoint there are no trained weights to take the EMA
        # or adapter from; serving random weights while the operator believes
        # the fine-tuned model is live would be silent corruption.
        raise ValueError(
            "--use-ema/--lora-name require --checkpoint: they select roles "
            "inside a models dir; without one the server would silently run "
            "random weights")
    import dataclasses

    cfg = config or AppConfig()
    if quantize:
        cfg = dataclasses.replace(
            cfg, unet=dataclasses.replace(cfg.unet, quantize=quantize))
    if checkpoint:
        return DiffuSynthRuntime.from_pretrained(
            checkpoint, config=cfg, use_ema=use_ema, lora_name=lora_name,
            mesh=mesh_obj)
    return DiffuSynthRuntime(cfg, mesh=mesh_obj)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8600)
    parser.add_argument("--max-batch", type=int, default=16)
    parser.add_argument("--window-ms", type=float, default=30.0)
    parser.add_argument("--warmup-manifest", default=None,
                        help="JSON manifest of programs to precompile at "
                             "startup, or 'default' for the built-in "
                             "serving-default shapes (see "
                             "warmup_from_manifest). With a warm AOT "
                             "cache this makes the first request fast")
    parser.add_argument("--request-timeout", type=float, default=900.0,
                        help="per-request wait cap in seconds (default "
                             "matches the stuck threshold; lower it when "
                             "a warmup manifest removes cold compiles)")
    parser.add_argument("--quantize", default="int8",
                        choices=["int8", "none"],
                        help="W8A8 int8 U-Net convs (ops/quant.py): "
                             "~9%% faster steps; DEFAULT since r3 — on a "
                             "trained checkpoint int8-vs-bf16 e2e drift "
                             "is below the bf16 default's own bf16-vs-f32 "
                             "drift (docs/PARITY_E2E.md). --quantize none "
                             "restores bf16")
    parser.add_argument("--checkpoint", default=None,
                        help="orbax models dir with converted/trained "
                             "weights (compat.convert_cli / train.run "
                             "output); default: random weights")
    parser.add_argument("--use-ema", action="store_true",
                        help="prefer the UNet_ema role from --checkpoint")
    parser.add_argument("--lora-name", default=None,
                        help="bake the <name>_UNet_lora adapter from "
                             "--checkpoint into the U-Net at load time")
    parser.add_argument("--mesh", default="auto",
                        help="'auto' (default): DP-shard coalesced batches "
                             "over all visible devices when >1 is present; "
                             "'off': single chip; N: mesh over N devices")
    args = parser.parse_args(argv)
    from diffusynth_tpu.ops.dispatch import describe_fences

    print(f"[serve] kernel fences: {describe_fences()}", flush=True)
    print("initializing models (first TPU compile takes minutes)...",
          flush=True)
    quantize = None if args.quantize == "none" else args.quantize
    runtime = build_runtime(checkpoint=args.checkpoint,
                            quantize=quantize, use_ema=args.use_ema,
                            lora_name=args.lora_name, mesh=args.mesh)
    server = make_server(args.host, args.port, runtime=runtime,
                         max_batch=args.max_batch,
                         window_ms=args.window_ms,
                         request_timeout_s=args.request_timeout)
    if args.warmup_manifest:
        server.app.warmup_from_manifest(args.warmup_manifest)
    print(f"DiffuSynth-TPU serving on http://{args.host}:{args.port}",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
