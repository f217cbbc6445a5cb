"""Serving boot + first-request latency (VERDICT r3 task #4).

Round 3 measured a 130 s cold FIRST REQUEST: model inits loaded from the
AOT cache in ~8 s but the coalesced-batch programs (serving's batch shapes
differ from bench's) compiled on first use. The fix shipped in r4: the
server pre-warms every serving-default program at boot, BEFORE accepting
traffic (`--warmup-manifest default`), and those programs go through the
AOT executable cache so a warm-cache boot loads them in seconds.

This harness measures the full story in one go:

    boot_s          process start -> "serving on" (includes warmup)
    t2s_first_s     first /v1/text2sound round trip after boot
    inp_first_s     first /v1/inpaint round trip (guided task)
    t2s_second_s    second t2s request (steady-state reference)

Run it twice: the first populates the AOT cache (cold), the second
measures the warm-boot numbers the VERDICT targets (< 15 s first request).

Run: cd /root/repo && python -u -m benchmarks.serving_cold_start
     [--no-warmup]  (the r3 behavior, for the before/after comparison)
"""

from __future__ import annotations

import argparse
import base64
import json
import subprocess
import sys
import time
import urllib.request

PORT = 8611


def post(path: str, body: dict, timeout: float = 900.0) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{PORT}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


def main():
    global PORT
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-warmup", action="store_true",
                    help="boot without the manifest (r3 behavior)")
    ap.add_argument("--port", type=int, default=PORT)
    args = ap.parse_args()
    PORT = args.port

    cmd = [sys.executable, "-u", "-m", "diffusynth_tpu.serving.server",
           "--port", str(PORT)]
    if not args.no_warmup:
        cmd += ["--warmup-manifest", "default"]

    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True)
    boot_s = None
    try:
        for line in proc.stdout:
            print(f"[server] {line}", end="", flush=True)
            if "serving on" in line:
                boot_s = time.time() - t0
                break
        if boot_s is None:
            raise RuntimeError("server exited before accepting traffic")
        # Drain server output in the background so it can't block on a
        # full pipe.
        import threading

        threading.Thread(target=lambda: [None for _ in proc.stdout],
                         daemon=True).start()

        t = time.time()
        post("/v1/text2sound", {"prompt": "a bright synthetic lead",
                                "negative_prompt": "noise",
                                "steps": 20, "cfg": 6.0, "seed": 1})
        t2s_first = time.time() - t

        # Inpaint needs an uploaded WAV (the guided path): a synthetic
        # 3 s tone, like the UI's upload flow.
        import io

        import numpy as np
        from scipy.io import wavfile

        sr = 16000
        tt = np.arange(3 * sr) / sr
        tone = (0.5 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32)
        buf = io.BytesIO()
        wavfile.write(buf, sr, tone)
        audio_b64 = base64.b64encode(buf.getvalue()).decode()

        t = time.time()
        post("/v1/inpaint", {"prompt": "a warm organ", "steps": 20,
                             "cfg": 6.0, "seed": 2, "audio_b64": audio_b64,
                             "mask_time_begin": 0.5, "mask_time_end": 1.5})
        inp_first = time.time() - t

        t = time.time()
        post("/v1/text2sound", {"prompt": "a plucked string",
                                "steps": 20, "cfg": 6.0, "seed": 3})
        t2s_second = time.time() - t

        print(json.dumps({
            "warmup": not args.no_warmup,
            "boot_s": round(boot_s, 1),
            "t2s_first_s": round(t2s_first, 2),
            "inp_first_s": round(inp_first, 2),
            "t2s_second_s": round(t2s_second, 2),
        }), flush=True)
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
