"""Cold-start with the compressed AOT executable cache (VERDICT r2 #4).

One process = one cold start. Run the SAME command twice (the cache is
now ON by default under the tunnel): the first populates the cache (and
its stdout records serialized + zlib sizes per program), the second
loads instead of compiling. The printed total wall-to-first-audio is
the cold-start number; compare the pair.

    python -m benchmarks.aot_cold_start --batch 64
    python -m benchmarks.aot_cold_start --batch 64

History: in r2 loading pushed the program binary to the remote backend
at ~0.3 MB/s (83 MB U-Net fwd = 285 s vs 29 s fresh compile) and the
cache auto-disabled under axon; the r3 re-measurement found the backend
updated (121 MB sampler step loads in 1-2 s across three runs,
RESULTS_r3.md section 8), so the default flipped to ON.
"""

from __future__ import annotations

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    t_start = time.time()
    from diffusynth_tpu.configs import AppConfig
    from diffusynth_tpu.pipelines import DiffuSynthRuntime, Text2SoundPipeline
    from diffusynth_tpu.text import CachedTextEncoder, HashTextEncoder
    from diffusynth_tpu.utils import aot_cache

    rt = DiffuSynthRuntime(
        AppConfig(), text_encoder=CachedTextEncoder(HashTextEncoder(512)),
        seed=0)
    t_init = time.time()
    pipe = Text2SoundPipeline(rt)
    res = pipe("a bright synthetic lead", "noise", batchsize=args.batch,
               duration_sec=3.0, steps=args.steps, cfg=6.0, seed=1,
               return_audio=True, audio_format="int16")
    t_first = time.time()
    entries = sorted(aot_cache.cache_dir().glob("*.aot"))
    total_mb = sum(p.stat().st_size for p in entries) / 1e6
    print(f"batch {args.batch}: init {t_init - t_start:.1f}s, "
          f"first audio at {t_first - t_start:.1f}s from process start "
          f"(audio shape {res.audio.shape}); cache dir has {len(entries)} "
          f"entries, {total_mb:.1f} MB on disk "
          f"(mode={os.environ.get('DIFFUSYNTH_AOT_CACHE', '<unset>')})",
          flush=True)


if __name__ == "__main__":
    main()
